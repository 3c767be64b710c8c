"""Numerical parity: our prob generator (denoiser) vs the reference.

Same philosophy as test_parity_prior: the reference runs exact-length
per-utterance (as its single-utterance CLI does); ours runs the bucketed
batch with masks.  Valid frames must agree.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from tests.parity_utils import SMALL_PROB_CFG, assert_close, prefixed_state_dict
from tests.reference_loader import load_reference
from tools.convert_torch_ckpt import convert_prob_generator

from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator
from flamed_tts_tpu.ops.masking import mask_from_lengths


@pytest.fixture(scope="module")
def setup():
    ref = load_reference()
    torch.manual_seed(1)
    ref_prob = ref.prob_generator.ProbGenerator(SMALL_PROB_CFG).eval()
    sd = prefixed_state_dict(ref_prob, "prob_generator")
    params = {"params": convert_prob_generator(sd)}
    our_prob = ProbGenerator(config=SMALL_PROB_CFG)
    return ref, ref_prob, our_prob, params


def _inputs(b=2, l=12):
    rng = np.random.RandomState(7)
    n_q = SMALL_PROB_CFG["n_quantizers"]
    d = SMALL_PROB_CFG["cond_dim"]
    hiddens = rng.randn(b, n_q, l, d).astype(np.float32)
    spk = rng.randn(b, SMALL_PROB_CFG["spk_dim"]).astype(np.float32)
    tgt_lens = np.array([l, l - 5])
    for i, n in enumerate(tgt_lens):
        hiddens[i, :, n:, :] = 0.0
    return hiddens, spk, tgt_lens


def test_condition_encoder_parity(setup):
    ref, ref_prob, our_prob, params = setup
    hiddens, spk, tgt_lens = _inputs()
    b, _, l, _ = hiddens.shape

    ref_cond = np.zeros((b, l, SMALL_PROB_CFG["target_dim"]), np.float32)
    with torch.no_grad():
        for i in range(b):
            n = int(tgt_lens[i])
            h = torch.from_numpy(hiddens[i : i + 1, :, :n, :])
            mask = torch.ones(1, n, 1, dtype=torch.bool)
            c = ref_prob.quantizer_encoding(h)
            ref_cond[i, :n] = ref_prob.cond_downsampling(c, mask).numpy()[0]

    pad_mask = mask_from_lengths(jnp.asarray(tgt_lens), l)
    our_cond = our_prob.apply(
        params, jnp.asarray(hiddens), pad_mask, method="encode_condition"
    )
    for i in range(b):
        n = int(tgt_lens[i])
        assert_close(np.asarray(our_cond)[i, :n], ref_cond[i, :n], name=f"cond utt{i}")


def test_denoiser_parity(setup):
    ref, ref_prob, our_prob, params = setup
    hiddens, spk, tgt_lens = _inputs()
    b, _, l, _ = hiddens.shape
    rng = np.random.RandomState(8)
    x = rng.randn(b, l, SMALL_PROB_CFG["target_dim"]).astype(np.float32)

    # scalar t (sampling convention, prob_generator.py:444)
    t = np.float32(0.62)
    ref_v = np.zeros_like(x)
    with torch.no_grad():
        for i in range(b):
            n = int(tgt_lens[i])
            ref_v[i, :n] = ref_prob.denoiser(
                torch.from_numpy(x[i : i + 1, :n]),
                torch.tensor([[t]]),
                torch.from_numpy(spk[i : i + 1]),
            ).numpy()[0]

    pad_mask = mask_from_lengths(jnp.asarray(tgt_lens), l)
    our_v = our_prob.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(spk), pad_mask,
        method="denoise",
    )
    for i in range(b):
        n = int(tgt_lens[i])
        assert_close(np.asarray(our_v)[i, :n], ref_v[i, :n], name=f"denoiser utt{i}")


def test_denoiser_per_position_t(setup):
    """Training convention: t varies per (B, L) (prob_generator.py:418)."""
    ref, ref_prob, our_prob, params = setup
    hiddens, spk, tgt_lens = _inputs()
    b, _, l, _ = hiddens.shape
    rng = np.random.RandomState(9)
    x = rng.randn(b, l, SMALL_PROB_CFG["target_dim"]).astype(np.float32)
    t = rng.rand(b, l).astype(np.float32)

    n = l  # full-length: per-position t path, no padding
    with torch.no_grad():
        ref_v = ref_prob.denoiser(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(spk)
        ).numpy()

    pad_mask = mask_from_lengths(jnp.asarray(np.array([l, l])), l)
    our_v = our_prob.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(spk), pad_mask,
        method="denoise",
    )
    assert_close(our_v, ref_v, name="per-position t")


def test_full_prob_sample_parity(setup):
    """Full Euler loop with shared noise: bucketed batch vs reference
    exact-length runs (loop: prob_generator.py:434-446)."""
    ref, ref_prob, our_prob, params = setup
    hiddens, spk, tgt_lens = _inputs()
    b, _, l, _ = hiddens.shape
    nfe, temp = 4, 0.5
    rng = np.random.RandomState(10)
    noise = rng.randn(b, l, SMALL_PROB_CFG["target_dim"]).astype(np.float32)

    ref_out = np.zeros((b, l, SMALL_PROB_CFG["target_dim"]), np.float32)
    with torch.no_grad():
        for i in range(b):
            n = int(tgt_lens[i])
            h = torch.from_numpy(hiddens[i : i + 1, :, :n, :])
            mask = torch.ones(1, n, 1, dtype=torch.bool)
            cond = ref_prob.cond_downsampling(ref_prob.quantizer_encoding(h), mask)
            ts = torch.linspace(0, 1, nfe + 1)
            xt = torch.from_numpy(noise[i : i + 1, :n]) * temp + cond
            for s in range(1, len(ts)):
                vt = ref_prob.denoiser(
                    xt, ts[s - 1].unsqueeze(0).unsqueeze(1),
                    torch.from_numpy(spk[i : i + 1]),
                )
                xt = xt + (1 / nfe) * vt
            ref_out[i, :n] = xt.numpy()[0]

    from flamed_tts_tpu.models.prob.prob_generator import prob_sample

    import jax

    pad_mask = mask_from_lengths(jnp.asarray(tgt_lens), l)

    # inject the same noise by monkeypatching via direct loop (mirror of
    # prob_sample semantics with fixed noise)
    cond = our_prob.apply(params, jnp.asarray(hiddens), pad_mask, method="encode_condition")
    xt = jnp.asarray(noise) * temp + cond
    ts = jnp.linspace(0.0, 1.0, nfe + 1)[:-1]
    for t_i in ts:
        vt = our_prob.apply(
            params, xt, t_i, jnp.asarray(spk), pad_mask, method="denoise"
        )
        xt = xt + (1.0 / nfe) * vt

    for i in range(b):
        n = int(tgt_lens[i])
        assert_close(
            np.asarray(xt)[i, :n], ref_out[i, :n],
            name=f"latents utt{i}", atol=1e-3, rtol=1e-3,
        )
