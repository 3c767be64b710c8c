"""Training losses for the full Flamed model.

Reference semantics (flamed.py:48-87):
  total = dur_loss + sil_loss + prior_loss + fm_loss + anchor_loss

Two normalization modes (``loss_norm``):

* ``"masked"`` (default): every mean is a *valid-position* mean.  The
  reference's padded-buffer mean couples its loss scale to the batch's
  max length; bucketed padding would amplify that artifact.
* ``"reference"``: byte-exact reproduction of the reference formulas —
  ``F.mse_loss`` over the full padded buffer and ``F.cross_entropy``
  including pad positions (a gradient-free log(V+1) constant each).
  Use it to compare loss curves against a reference run at the same
  buffer lengths (``train.py --loss-norm reference``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from flamed_tts_tpu.models.prior.sampling import pva_loss
from flamed_tts_tpu.models.prob.prob_generator import prob_loss
from flamed_tts_tpu.ops.length_regulator import length_regulate
from flamed_tts_tpu.ops.masking import mask_from_lengths


def prior_ce_loss(
    logits: jnp.ndarray,   # (B, n_q, L, V+1), zero-masked at pads
    codes: jnp.ndarray,    # (B, n_q, L) int, pad = V
    tgt_mask: jnp.ndarray,  # (B, L) True = pad
    loss_norm: str = "masked",
) -> jnp.ndarray:
    """Mean per-quantizer cross-entropy (prior_generator.py:115-118).

    ``"masked"`` averages over valid frames.  ``"reference"`` reproduces
    the reference ``F.cross_entropy`` over the whole padded buffer: pad
    positions (zero-masked logits, pad-class target) each contribute a
    constant log(V+1) with zero gradient (the mask multiply kills it)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, codes[..., None], axis=-1)[..., 0]
    if loss_norm == "reference":
        return -picked.mean()
    valid = (~tgt_mask)[:, None, :].astype(jnp.float32)
    # The numerator broadcasts over all n_q quantizer rows; the denominator
    # must too, so the result is the MEAN per-quantizer CE (the reference's
    # relative loss weighting), not the sum.
    denom = jnp.maximum(valid.sum() * logits.shape[1], 1.0)
    return -(picked * valid).sum() / denom


def compute_losses(
    prior_module,
    prob_module,
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    sigma_min_pva: float = 1e-4,
    sigma_min_prob: float = 1e-6,
    train: bool = True,
    loss_norm: str = "masked",
) -> Dict[str, jnp.ndarray]:
    """Full loss dict for one batch.

    ``batch`` keys (the reference 9-tuple, flamed_lightning.py:62-73):
      phonemes (B, L) int, x_len (B,), codes (B, n_q, Lf) int,
      y_len (B,), phone_dur (B, L), sil_dur (B, L),
      embs (B, Lf, 256), prompts (B, n_q, P) int, spks (B, 256)
    """
    phonemes = batch["phonemes"]
    x_len = batch["x_len"]
    codes = batch["codes"]
    y_len = batch["y_len"]
    phone_dur = batch["phone_dur"]
    sil_dur = batch["sil_dur"]
    embs = batch["embs"]
    prompts = batch["prompts"]
    spks = batch["spks"]

    b, l = phonemes.shape
    lf = codes.shape[-1]
    p = prompts.shape[-1]

    rng_pva, rng_prob, rng_drop1, rng_drop2, rng_drop3 = jax.random.split(rng, 5)
    det = not train
    rngs1 = None if det else {"dropout": rng_drop1}
    rngs2 = None if det else {"dropout": rng_drop2}
    rngs3 = None if det else {"dropout": rng_drop3}

    src_mask = mask_from_lengths(x_len, l)
    tgt_mask = mask_from_lengths(y_len, lf)

    enc_out = prior_module.apply(
        params["prior"], phonemes, src_mask,
        method="encode", deterministic=det, rngs=rngs1,
    )

    losses = pva_loss(
        prior_module, params["prior"], enc_out, src_mask,
        phone_dur, sil_dur, rng_pva, sigma_min_pva, rngs=rngs2,
        loss_norm=loss_norm,
    )

    # Teacher-forced length regulation (pva.py:84).
    lr_out, _ = length_regulate(enc_out, phone_dur, sil_dur, x_len, lf)
    # Collators with prompt buckets pad the prompt buffer and report the
    # true length; the prior decode masks the pad tail.  Legacy batches
    # (no "prompt_lens") are fully valid by construction.
    prompt_lens = batch.get("prompt_lens")
    if prompt_lens is None:
        prompt_lens = jnp.full((b,), p, dtype=jnp.int32)
    hiddens, logits = prior_module.apply(
        params["prior"], lr_out, tgt_mask, prompts, prompt_lens,
        method="decode", deterministic=det, rngs=rngs3,
    )
    losses["prior_loss"] = prior_ce_loss(logits, codes, tgt_mask, loss_norm=loss_norm)

    losses.update(
        prob_loss(
            prob_module, params["prob"], embs, hiddens, spks, tgt_mask,
            rng_prob, sigma_min_prob, loss_norm=loss_norm,
        )
    )
    losses["total_loss"] = sum(
        v for k, v in losses.items() if k.endswith("_loss")
    )
    return losses
