"""Throughput mode: batch sharded over the mesh 'data' axis must produce
the same outputs as the unsharded run (same rng, same buckets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.parity_utils import SMALL_PRIOR_CFG, SMALL_PROB_CFG
from tests.test_training import tiny_modules, tiny_params

from flamed_tts_tpu.parallel.mesh import make_mesh
from flamed_tts_tpu.runtime.sampler import BucketedSampler

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


@pytest.fixture(scope="module")
def setup():
    prior, prob = tiny_modules()
    params = tiny_params(prior, prob, jax.random.PRNGKey(0))
    sampler = BucketedSampler(
        prior, prob,
        phoneme_buckets=[16], frame_buckets=[64], prompt_buckets=[8],
    )
    return sampler, params


def _inputs(b):
    rng = np.random.RandomState(0)
    n_q = SMALL_PRIOR_CFG["codec"]["n_quantizers"]
    vocab = SMALL_PRIOR_CFG["codec"]["vocab_size"]
    return dict(
        phonemes=rng.randint(1, 300, (b, 12)).astype(np.int32),
        src_lens=np.full((b,), 12, np.int32),
        prompts=rng.randint(0, vocab, (b, n_q, 6)).astype(np.int32),
        prompt_lens=np.full((b,), 6, np.int32),
        timbres=rng.randn(b, SMALL_PROB_CFG["spk_dim"]).astype(np.float32),
    )


def test_sharded_matches_unsharded(setup):
    sampler, params = setup
    inputs = _inputs(8)
    rng = jax.random.PRNGKey(3)
    kwargs = dict(nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32)

    out_ref = sampler.sample(params["prior"], params["prob"], rng=rng, **inputs, **kwargs)

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        out_sh = sampler.sample(
            params["prior"], params["prob"], rng=rng, mesh=mesh, **inputs, **kwargs
        )

    np.testing.assert_array_equal(
        np.asarray(out_ref["tgt_len"]), np.asarray(out_sh["tgt_len"])
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["latents"]), np.asarray(out_sh["latents"]),
        atol=1e-5, rtol=1e-5,
    )


def test_sharded_pads_partial_batch(setup):
    """B=5 on an 8-way mesh: padded internally, outputs sliced back."""
    sampler, params = setup
    inputs = _inputs(5)
    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        out = sampler.sample(
            params["prior"], params["prob"], rng=jax.random.PRNGKey(0),
            mesh=mesh, nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32,
            **inputs,
        )
    assert out["latents"].shape[0] == 5
    assert out["tgt_len"].shape[0] == 5


def test_fused_matches_two_stage(setup):
    """The fused single-call path and the two-stage path must produce
    identical outputs for the same rng (same noise split order)."""
    sampler, params = setup
    inputs = _inputs(2)
    rng = jax.random.PRNGKey(11)
    kwargs = dict(nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32)

    out_fused = sampler.sample(
        params["prior"], params["prob"], rng=rng, fused=True, **inputs, **kwargs
    )
    out_two = sampler.sample(
        params["prior"], params["prob"], rng=rng, fused=False, **inputs, **kwargs
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused["tgt_len"]), np.asarray(out_two["tgt_len"])
    )
    f = min(out_fused["latents"].shape[1], out_two["latents"].shape[1])
    np.testing.assert_allclose(
        np.asarray(out_fused["latents"])[:, :f],
        np.asarray(out_two["latents"])[:, :f],
        atol=1e-5, rtol=1e-5,
    )


def test_fused_overflow_retry():
    """A too-small speculative bucket must trigger the overflow retry and
    still return unclipped results (retry is guaranteed: 20 phonemes at
    >= 1 frame each cannot fit the 16-frame first bucket)."""
    prior, prob = tiny_modules()
    params = tiny_params(prior, prob, jax.random.PRNGKey(0))
    sampler = BucketedSampler(
        prior, prob, phoneme_buckets=[32], frame_buckets=[16, 96],
        prompt_buckets=[8],
    )
    rng_np = np.random.RandomState(0)
    n_q = SMALL_PRIOR_CFG["codec"]["n_quantizers"]
    inputs = dict(
        phonemes=rng_np.randint(1, 300, (1, 20)).astype(np.int32),
        src_lens=np.array([20], np.int32),
        prompts=rng_np.randint(0, 32, (1, n_q, 6)).astype(np.int32),
        prompt_lens=np.array([6], np.int32),
        timbres=rng_np.randn(1, SMALL_PROB_CFG["spk_dim"]).astype(np.float32),
    )
    out_small = sampler.sample(
        params["prior"], params["prob"], rng=jax.random.PRNGKey(5),
        fused=True, frames_per_phoneme_budget=0.5,  # guess bucket = 16
        nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32, **inputs,
    )
    assert out_small["latents"].shape[1] == 96  # retried at the big bucket
    out_ref = sampler.sample(
        params["prior"], params["prob"], rng=jax.random.PRNGKey(5),
        fused=False, nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32, **inputs,
    )
    np.testing.assert_array_equal(
        np.asarray(out_small["tgt_len"]), np.asarray(out_ref["tgt_len"])
    )
