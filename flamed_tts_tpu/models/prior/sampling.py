"""Prior-generator sampling and training losses (pure functions).

The flow-matching Euler loops run as ``jax.lax.scan`` with a static step
count so the whole prior sampling path is one XLA program (reference's
Python loops: pva.py:104-109; training losses: pva.py:54-86,
prior_generator.py:64-139).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from flamed_tts_tpu.ops.length_regulator import length_regulate
from flamed_tts_tpu.ops.masking import mask_from_lengths


def durations_from_flow(x: jnp.ndarray) -> jnp.ndarray:
    """log-space flow state -> integer frame counts (pva.py:111-112)."""
    return jnp.clip(jnp.round(jnp.exp(x) - 1.0), 0, None)


def pva_sample(
    module,
    params,
    enc_out: jnp.ndarray,
    src_mask: jnp.ndarray,
    rng: jax.Array,
    nfe: int,
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Euler-integrate the duration/silence flows; returns integer
    (phone_dur, sil_dur) of shape (B, L)."""
    b, l, _ = enc_out.shape
    rng_dur, rng_sil = jax.random.split(rng)
    dur_t = jax.random.normal(rng_dur, (b, l), dtype=jnp.float32) * temperature
    sil_t = jax.random.normal(rng_sil, (b, l), dtype=jnp.float32) * temperature

    ts = jnp.linspace(0.0, 1.0, nfe + 1, dtype=jnp.float32)[:-1]
    delta_t = 1.0 / nfe

    def step(carry, t):
        dur, sil = carry
        v_dur, v_sil = module.apply(
            params, dur, sil, enc_out, t, src_mask, method="pva_fields"
        )
        return (dur + delta_t * v_dur, sil + delta_t * v_sil), None

    (dur_t, sil_t), _ = jax.lax.scan(step, (dur_t, sil_t), ts)
    return durations_from_flow(dur_t), durations_from_flow(sil_t)


def prior_sample(
    module,
    params,
    phonemes: jnp.ndarray,     # (B, L) int32
    src_lens: jnp.ndarray,     # (B,)
    prompts: jnp.ndarray,      # (B, n_q, P) int32
    prompt_lens: jnp.ndarray,  # (B,)
    rng: jax.Array,
    nfe: int,
    temperature: float,
    max_frames: int,
) -> Dict[str, jnp.ndarray]:
    """Full prior sampling (reference prior_generator.py:141-196).

    Returns dict with hiddens (B, n_q, Lf, D), logits, tgt_len, tgt_mask.
    """
    src_mask = mask_from_lengths(src_lens, phonemes.shape[1])
    enc_out = module.apply(params, phonemes, src_mask, method="encode")

    phone_dur, sil_dur = pva_sample(
        module, params, enc_out, src_mask, rng, nfe, temperature
    )
    lr_out, tgt_len = length_regulate(
        enc_out, phone_dur, sil_dur, src_lens, max_frames
    )
    tgt_mask = mask_from_lengths(tgt_len, max_frames)

    hiddens, logits = module.apply(
        params, lr_out, tgt_mask, prompts, prompt_lens, method="decode"
    )
    return {
        "hiddens": hiddens,
        "logits": logits,
        "tgt_len": tgt_len,
        "tgt_mask": tgt_mask,
        "phone_dur": phone_dur,
        "sil_dur": sil_dur,
    }


def pva_loss(
    module,
    params,
    enc_out: jnp.ndarray,
    src_mask: jnp.ndarray,
    phone_dur: jnp.ndarray,
    sil_dur: jnp.ndarray,
    rng: jax.Array,
    sigma_min: float,
    rngs: Dict[str, jax.Array] | None = None,
    loss_norm: str = "masked",
    _t_override: jnp.ndarray | None = None,
    _noise_override: tuple | None = None,
) -> Dict[str, jnp.ndarray]:
    """OT-CFM losses on log-durations (pva.py:54-86).

    ``loss_norm="masked"`` (default) takes MSE means over valid positions;
    ``"reference"`` reproduces the reference's ``F.mse_loss`` over the full
    padded buffer (pva.py:70,78 — the loss scale then depends on the
    buffer/bucket length, as it does on batch-max length in the reference).
    ``_t_override``/``_noise_override`` are parity-test hooks that replace
    the sampled t / (dur, sil) noise with given tensors.
    """
    b, l = phone_dur.shape
    rng_t, rng_d0, rng_s0 = jax.random.split(rng, 3)
    t = jax.random.uniform(rng_t, (b, 1), dtype=jnp.float32)
    if _t_override is not None:
        t = _t_override

    valid = (~src_mask).astype(jnp.float32)
    if loss_norm == "reference":
        denom = jnp.float32(b * l)
    else:
        denom = jnp.maximum(valid.sum(), 1.0)

    def interpolate(target_dur, noise_rng, noise_fixed):
        x1 = jnp.log(target_dur.astype(jnp.float32) + 1.0)
        if noise_fixed is not None:
            x0 = noise_fixed
        else:
            x0 = jax.random.normal(noise_rng, x1.shape, dtype=jnp.float32)
        xt = t * x1 + (1.0 - (1.0 - sigma_min) * t) * x0
        u = (x1 - (1.0 - sigma_min) * x0) * valid
        return xt, u

    n_dur, n_sil = _noise_override if _noise_override is not None else (None, None)
    dur_xt, dur_u = interpolate(phone_dur, rng_d0, n_dur)
    sil_xt, sil_u = interpolate(sil_dur, rng_s0, n_sil)
    v_dur, v_sil = module.apply(
        params, dur_xt, sil_xt, enc_out, t[:, 0], src_mask,
        method="pva_fields",
        rngs=rngs,
        deterministic=rngs is None,
    )
    dur_loss = jnp.sum(((v_dur - dur_u) ** 2) * valid) / denom
    sil_loss = jnp.sum(((v_sil - sil_u) ** 2) * valid) / denom
    return {"dur_loss": dur_loss, "sil_loss": sil_loss}
