"""Bucket-overflow honesty: clipping past the largest bucket must warn
(VERDICT round-1 weak item 7: reference lengths are unbounded,
pva.py:111-116; our static buckets clip)."""

import numpy as np
import pytest

import jax

from tests.parity_utils import SMALL_PRIOR_CFG, SMALL_PROB_CFG
from tests.test_training import tiny_modules, tiny_params

from flamed_tts_tpu.runtime.sampler import BucketedSampler

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


@pytest.fixture(scope="module")
def modules():
    prior, prob = tiny_modules()
    params = tiny_params(prior, prob, jax.random.PRNGKey(0))
    return prior, prob, params


def _inputs(b=1, n_phon=12, n_prompt=6):
    rng = np.random.RandomState(0)
    n_q = SMALL_PRIOR_CFG["codec"]["n_quantizers"]
    vocab = SMALL_PRIOR_CFG["codec"]["vocab_size"]
    return dict(
        phonemes=rng.randint(1, 300, (b, n_phon)).astype(np.int32),
        src_lens=np.full((b,), n_phon, np.int32),
        prompts=rng.randint(0, vocab, (b, n_q, n_prompt)).astype(np.int32),
        prompt_lens=np.full((b,), n_prompt, np.int32),
        timbres=rng.randn(b, SMALL_PROB_CFG["spk_dim"]).astype(np.float32),
    )


def _sample(sampler, params, fused, **inputs):
    return sampler.sample(
        params["prior"], params["prob"], rng=jax.random.PRNGKey(1),
        nsteps_durgen=2, nsteps_denoiser=2, vocab_pad=32, fused=fused,
        **inputs,
    )


def test_phoneme_overflow_warns(modules):
    prior, prob, params = modules
    sampler = BucketedSampler(
        prior, prob, phoneme_buckets=[16], frame_buckets=[64], prompt_buckets=[8]
    )
    with pytest.warns(UserWarning, match="phoneme length 20 exceeds"):
        _sample(sampler, params, fused=True, **_inputs(n_phon=20))


def test_prompt_overflow_warns(modules):
    prior, prob, params = modules
    sampler = BucketedSampler(
        prior, prob, phoneme_buckets=[16], frame_buckets=[64], prompt_buckets=[8]
    )
    with pytest.warns(UserWarning, match="prompt length 12 frames exceeds"):
        _sample(sampler, params, fused=True, **_inputs(n_prompt=12))


@pytest.mark.parametrize("fused", [True, False])
def test_frame_overflow_warns(modules, fused):
    prior, prob, params = modules
    # tgt_len >= n_phon (each phoneme emits >= 1 frame) > the 8-frame bucket
    sampler = BucketedSampler(
        prior, prob, phoneme_buckets=[16], frame_buckets=[8], prompt_buckets=[8]
    )
    with pytest.warns(UserWarning, match="exceeds the largest frame bucket 8"):
        out = _sample(sampler, params, fused=fused, **_inputs(n_phon=12))
    assert out["latents"].shape[1] == 8  # clipped to the bucket


def test_within_bucket_is_silent(modules):
    prior, prob, params = modules
    sampler = BucketedSampler(
        prior, prob, phoneme_buckets=[16], frame_buckets=[64], prompt_buckets=[8]
    )
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        _sample(sampler, params, fused=True, **_inputs())
