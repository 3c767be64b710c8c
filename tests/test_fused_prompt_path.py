"""Single-call sampling (prompt encode+analyze fused into the program)
must produce exactly what the staged path (codec.encode_prompt then
sample with prompts/timbres) produces.

The fused path exists because every separate device call costs ~25 ms of
tunnel dispatch (docs/PERFORMANCE.md); it must not change semantics
(reference: flamed.py:109-167 runs the same analysis before sampling).
"""

import numpy as np
import pytest

import jax

from tests.parity_utils import SMALL_PRIOR_CFG, SMALL_PROB_CFG

from flamed_tts_tpu.models.codec_wrapper import FaCodec
from flamed_tts_tpu.runtime.sampler import BucketedSampler

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


@pytest.fixture(scope="module")
def setup():
    # Small prior/prob that still match the production codec's interface:
    # 6 quantizer streams, 1024-code vocab, 256-dim latents/timbre.
    prior_cfg = {
        **SMALL_PRIOR_CFG,
        "transformer": {
            **SMALL_PRIOR_CFG["transformer"],
            "decoder_layers": [1, 1, 1, 1, 1, 1],
        },
        "codec": {"vocab_size": 1024, "n_quantizers": 6},
    }
    prob_cfg = {**SMALL_PROB_CFG, "target_dim": 256, "spk_dim": 256, "n_quantizers": 6}

    from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
    from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator

    prior = PriorGenerator(config=prior_cfg)
    prob = ProbGenerator(config=prob_cfg)

    import jax.numpy as jnp

    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
    b, l, p, f = 1, 8, 4, 16
    enc_h = prior_cfg["transformer"]["encoder_hidden"]
    prior_params = prior.init(
        r1,
        jnp.zeros((b, l), jnp.int32),
        jnp.zeros((b, l), bool),
        jnp.zeros((b, f, enc_h)),
        jnp.zeros((b, f), bool),
        jnp.zeros((b, 6, p), jnp.int32),
        jnp.full((b,), p, jnp.int32),
        method="init_all",
    )
    prob_params = prob.init(
        r2,
        jnp.zeros((b, 6, f, prob_cfg["cond_dim"])),
        jnp.zeros((b, 256)),
        jnp.zeros((b, f), bool),
    )
    codec = FaCodec.random_init(r3)
    sampler = BucketedSampler(
        prior, prob,
        phoneme_buckets=[16], frame_buckets=[128, 256], prompt_buckets=[96],
    )
    return sampler, {"prior": prior_params, "prob": prob_params}, codec


def test_fused_prompt_equals_staged(setup):
    sampler, params, codec = setup

    rng_np = np.random.RandomState(0)
    wav = (0.1 * np.sin(np.arange(16000) * 0.05)).astype(np.float32)
    phonemes = rng_np.randint(1, 300, (1, 12)).astype(np.int32)
    src_lens = np.full((1,), 12, np.int32)
    key = jax.random.PRNGKey(7)

    # Staged: separate prompt analysis call, then the fused program.
    # Reset the speculative-bucket history between the two calls below so
    # the first run's observed speech rate cannot shift the second run
    # into a different frame bucket (shapes must match for allclose).
    codes, timbre = codec.encode_prompt(wav)
    sampler._ratio_history.clear()
    out_a = sampler.sample(
        params["prior"], params["prob"], phonemes, src_lens,
        codes[None], np.asarray([codes.shape[-1]], np.int32), timbre[None],
        rng=key, nsteps_durgen=2, nsteps_denoiser=2,
        vocab_pad=1024, dec_params=codec.dec_params, fused=True,
    )

    # Single call: encode+analyze inside the program.  Clear the history
    # again: call A above appended its observed ratio.
    sampler._ratio_history.clear()
    padded, n_frames = codec.pad_prompt_wav(wav)
    out_b = sampler.sample(
        params["prior"], params["prob"], phonemes, src_lens,
        None, None, None,
        rng=key, nsteps_durgen=2, nsteps_denoiser=2,
        vocab_pad=1024, dec_params=codec.dec_params, fused=True,
        prompt_wav=padded[None], prompt_frames=np.asarray([n_frames], np.int32),
        codec=codec,
    )

    assert int(out_a["tgt_len"][0]) == int(out_b["tgt_len"][0])
    np.testing.assert_allclose(
        np.asarray(out_a["latents"], np.float32),
        np.asarray(out_b["latents"], np.float32),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["wav"], np.float32),
        np.asarray(out_b["wav"], np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_staged_requires_fused(setup):
    sampler, params, codec = setup
    with pytest.raises(ValueError, match="fused=True"):
        sampler.sample(
            params["prior"], params["prob"],
            np.ones((1, 4), np.int32), np.full((1,), 4, np.int32),
            None, None, None,
            rng=jax.random.PRNGKey(0), nsteps_durgen=2, nsteps_denoiser=2,
            dec_params=codec.dec_params, fused=False,
            prompt_wav=np.zeros((1, 16000), np.float32),
            prompt_frames=np.asarray([80], np.int32),
            codec=codec,
        )
