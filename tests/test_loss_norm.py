"""Loss-scale parity: ``loss_norm="reference"`` vs the actual reference.

The reference normalizes every training loss over the FULL padded buffer
(``F.mse_loss`` default mean, ``F.cross_entropy`` over all positions —
flamed/models/synthesizer/pva.py:70,78, prior_generator.py:115-118,
prob_generator.py:424,428), so its loss scale depends on batch padding.
Our default is valid-position means; ``loss_norm="reference"`` reproduces
the reference's normalization.  These tests drive the ACTUAL reference
modules with pinned t / noise (monkeypatched ``torch.rand`` /
``torch.randn_like``) and compare against our losses with the same
tensors injected through the parity-test hooks.

Scope note: the reference's padded training batches additionally leak the
pad positions' CFM noise into valid frames through the PVA / denoiser
convolutions, so its loss depends on batch composition.  Our mask-aware
modules are padding-invariant by design (the parity suite proves bucketed
batches equal the reference's exact-length runs), so the vs-torch
comparisons here use batches with NO padding (leakage-free); the
padded-batch normalization is checked by exact identities.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tests.parity_utils import SMALL_PRIOR_CFG, SMALL_PROB_CFG, prefixed_state_dict
from tests.reference_loader import load_reference
from tools.convert_torch_ckpt import convert_prior_generator, convert_prob_generator

from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
from flamed_tts_tpu.models.prior.sampling import pva_loss
from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator, prob_loss
from flamed_tts_tpu.ops.masking import mask_from_lengths
from flamed_tts_tpu.train.losses import prior_ce_loss


def _pin_torch_randomness(monkeypatch, rand_value, noise_queue):
    """Make torch.rand return ``rand_value`` and torch.randn_like pop
    successive arrays from ``noise_queue`` (call order of the reference)."""
    queue = list(noise_queue)

    def fake_rand(*size, **kwargs):
        t = torch.from_numpy(np.asarray(rand_value, np.float32))
        if size and isinstance(size[0], (tuple, torch.Size)):
            assert tuple(size[0]) == tuple(t.shape), (size, t.shape)
        return t

    def fake_randn_like(x, **kwargs):
        n = torch.from_numpy(queue.pop(0))
        assert n.shape == x.shape, (n.shape, x.shape)
        return n

    monkeypatch.setattr(torch, "rand", fake_rand)
    monkeypatch.setattr(torch, "randn_like", fake_randn_like)


def test_pva_loss_reference_norm(monkeypatch):
    ref = load_reference()
    torch.manual_seed(0)
    ref_pg = ref.prior_generator.PriorGenerator(SMALL_PRIOR_CFG).eval()
    params = {"params": convert_prior_generator(
        prefixed_state_dict(ref_pg, "prior_generator"))}
    our_pg = PriorGenerator(config=SMALL_PRIOR_CFG)

    rng = np.random.RandomState(11)
    b, l = 2, 9
    h = SMALL_PRIOR_CFG["transformer"]["encoder_hidden"]
    enc = rng.randn(b, l, h).astype(np.float32)
    src_lens = np.array([l, l], dtype=np.int64)  # no padding: leakage-free
    phone_dur = rng.randint(1, 5, (b, l)).astype(np.float32)
    sil_dur = rng.randint(0, 3, (b, l)).astype(np.float32)
    max_tgt = int((phone_dur + sil_dur).sum(1).max())

    t = rng.rand(b, 1).astype(np.float32)
    n_dur = rng.randn(b, l).astype(np.float32)
    n_sil = rng.randn(b, l).astype(np.float32)
    _pin_torch_randomness(monkeypatch, t, [n_dur, n_sil])

    from flamed.utils.tools import get_mask_from_lengths

    with torch.no_grad():
        mask_t = get_mask_from_lengths(torch.from_numpy(src_lens), l)
        _, ref_losses = ref_pg.pva.compute_loss(
            torch.from_numpy(enc), torch.from_numpy(src_lens), mask_t,
            max_tgt, torch.from_numpy(phone_dur), torch.from_numpy(sil_dur),
        )

    mask_j = mask_from_lengths(jnp.asarray(src_lens), l)
    ours = pva_loss(
        our_pg, params, jnp.asarray(enc), mask_j,
        jnp.asarray(phone_dur), jnp.asarray(sil_dur),
        jax.random.PRNGKey(0), sigma_min=1e-4,
        loss_norm="reference",
        _t_override=jnp.asarray(t),
        _noise_override=(jnp.asarray(n_dur), jnp.asarray(n_sil)),
    )
    for key in ("dur_loss", "sil_loss"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref_losses[key]), rtol=2e-5, err_msg=key
        )

    # Padded batch: the two modes differ exactly by the valid fraction.
    pad_lens = np.array([l, l - 3], dtype=np.int64)
    pad_mask = mask_from_lengths(jnp.asarray(pad_lens), l)
    kwargs = dict(
        _t_override=jnp.asarray(t),
        _noise_override=(jnp.asarray(n_dur), jnp.asarray(n_sil)),
    )
    ref_mode = pva_loss(
        our_pg, params, jnp.asarray(enc), pad_mask,
        jnp.asarray(phone_dur), jnp.asarray(sil_dur),
        jax.random.PRNGKey(0), sigma_min=1e-4,
        loss_norm="reference", **kwargs,
    )
    masked_mode = pva_loss(
        our_pg, params, jnp.asarray(enc), pad_mask,
        jnp.asarray(phone_dur), jnp.asarray(sil_dur),
        jax.random.PRNGKey(0), sigma_min=1e-4, **kwargs,
    )
    frac = float(pad_lens.sum()) / (b * l)
    np.testing.assert_allclose(
        float(ref_mode["dur_loss"]), float(masked_mode["dur_loss"]) * frac,
        rtol=1e-5,
    )


def test_prob_loss_reference_norm(monkeypatch):
    ref = load_reference()
    torch.manual_seed(1)
    ref_prob = ref.prob_generator.ProbGenerator(SMALL_PROB_CFG).eval()
    params = {"params": convert_prob_generator(
        prefixed_state_dict(ref_prob, "prob_generator"))}
    our_prob = ProbGenerator(config=SMALL_PROB_CFG)

    rng = np.random.RandomState(13)
    b, l = 2, 10
    n_q = SMALL_PROB_CFG["n_quantizers"]
    d_cond = SMALL_PROB_CFG["cond_dim"]
    d_tgt = SMALL_PROB_CFG["target_dim"]
    hiddens = rng.randn(b, n_q, l, d_cond).astype(np.float32)
    x1 = rng.randn(b, l, d_tgt).astype(np.float32)
    spk = rng.randn(b, SMALL_PROB_CFG["spk_dim"]).astype(np.float32)
    tgt_lens = np.array([l, l], dtype=np.int64)  # no padding: leakage-free

    t = rng.rand(b, l, 1).astype(np.float32)
    noise = rng.randn(b, l, d_tgt).astype(np.float32)
    _pin_torch_randomness(monkeypatch, t, [noise])

    from flamed.utils.tools import get_mask_from_lengths

    with torch.no_grad():
        pad_t = get_mask_from_lengths(torch.from_numpy(tgt_lens), l)
        ref_losses = ref_prob.compute_loss(
            torch.from_numpy(x1), torch.from_numpy(hiddens),
            torch.from_numpy(spk), (~pad_t).unsqueeze(-1),
        )

    pad_j = mask_from_lengths(jnp.asarray(tgt_lens), l)
    ours = prob_loss(
        our_prob, params, jnp.asarray(x1), jnp.asarray(hiddens),
        jnp.asarray(spk), pad_j, jax.random.PRNGKey(0), sigma_min=1e-6,
        loss_norm="reference",
        _t_override=jnp.asarray(t), _noise_override=jnp.asarray(noise),
    )
    for key in ("fm_loss", "anchor_loss"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref_losses[key]), rtol=2e-4, err_msg=key
        )


def test_prior_ce_reference_norm():
    """Reference CE over the padded buffer (zero-masked logits, pad-class
    targets) vs torch.nn.functional.cross_entropy, no module needed."""
    rng = np.random.RandomState(17)
    b, n_q, l, v = 2, 3, 8, 33
    tgt_lens = np.array([l, l - 3], dtype=np.int64)
    logits = rng.randn(b, n_q, l, v).astype(np.float32)
    codes = rng.randint(0, v - 1, (b, n_q, l))
    for i, n in enumerate(tgt_lens):
        logits[i, :, n:, :] = 0.0   # model zero-masks logits at pads
        codes[i, :, n:] = v - 1     # collator pads codes with the pad class

    ce = 0.0
    with torch.no_grad():
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)  # (b, c, n, l)
        for idx in range(n_q):
            ce = ce + torch.nn.functional.cross_entropy(
                lt[:, :, idx, :], torch.from_numpy(codes[:, idx, :])
            )
    ce = float(ce) / n_q

    pad_j = mask_from_lengths(jnp.asarray(tgt_lens), l)
    ours = prior_ce_loss(
        jnp.asarray(logits), jnp.asarray(codes), pad_j, loss_norm="reference"
    )
    np.testing.assert_allclose(float(ours), ce, rtol=2e-5)

    # Pad positions contribute exactly log(V) each, gradient-free.
    masked = prior_ce_loss(jnp.asarray(logits), jnp.asarray(codes), pad_j)
    n_valid, n_total = int(tgt_lens.sum()), b * l
    expected = (float(masked) * n_valid + (n_total - n_valid) * np.log(v)) / n_total
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)
