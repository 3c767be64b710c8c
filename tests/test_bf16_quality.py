"""bf16 parameter quality bound (VERDICT round-1 weak item 1).

The headline bench runs with bf16-cast parameters; these tests bound the
output divergence vs fp32 on fixed seeds so the speed number carries a
measured quality cost.  Full-size TPU numbers live in docs/PERFORMANCE.md
(tools/bf16_quality.py); these CPU tests enforce the bound mechanism at
reduced size.
"""

import numpy as np

import jax
import jax.numpy as jnp

from flamed_tts_tpu.models.facodec.decoder import init_decoder_params, synthesize
from flamed_tts_tpu.ops.melspec import mel_spectrogram

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


def _bf16(params):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )


def mel_l2(wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    """Mean L2 distance between log-mel frames (the standard spectral
    distortion proxy; reference-convention mel, ops/melspec.py)."""
    mel_a = np.asarray(mel_spectrogram(jnp.asarray(wav_a)))
    mel_b = np.asarray(mel_spectrogram(jnp.asarray(wav_b)))
    return float(np.sqrt(((mel_a - mel_b) ** 2).sum(axis=1)).mean())


def test_codec_decode_bf16_mel_distance():
    """Fixed latents through the codec decoder: bf16 params vs fp32."""
    params = init_decoder_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    latents = jax.random.normal(rng, (1, 40, 256), jnp.float32)
    timbre = jax.random.normal(jax.random.PRNGKey(2), (1, 256), jnp.float32)

    wav32 = np.asarray(synthesize(params, latents, timbre))[:, :, 0]
    wav16 = np.asarray(
        synthesize(
            _bf16(params), latents.astype(jnp.bfloat16), timbre.astype(jnp.bfloat16)
        ).astype(jnp.float32)
    )[:, :, 0]

    d = mel_l2(wav32, wav16)
    rel = float(np.abs(wav32 - wav16).mean() / (np.abs(wav32).mean() + 1e-9))
    print(f"codec bf16 mel-L2 = {d:.4f}, rel wave err = {rel:.4f}")
    # log-mel frames have L2 norm ~60-90 here; 2.0 is ~2-3% spectral error
    assert d < 2.0, f"bf16 codec decode drifted: mel-L2 {d:.3f}"


def test_denoiser_bf16_latent_distance():
    """Fixed-seed denoiser Euler loop: bf16 params vs fp32 latents."""
    from tests.parity_utils import SMALL_PROB_CFG
    from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator, prob_sample

    module = ProbGenerator(config=SMALL_PROB_CFG)
    n_q = SMALL_PROB_CFG["n_quantizers"]
    b, f = 1, 24
    cond = jax.random.normal(
        jax.random.PRNGKey(3), (b, n_q, f, SMALL_PROB_CFG["cond_dim"])
    )
    timbre = jax.random.normal(jax.random.PRNGKey(4), (b, SMALL_PROB_CFG["spk_dim"]))
    mask = jnp.zeros((b, f), bool)
    params = module.init(jax.random.PRNGKey(5), cond, timbre, mask)

    rng = jax.random.PRNGKey(6)
    lat32 = np.asarray(prob_sample(module, params, cond, timbre, mask, rng, 8, 0.3))
    lat16 = np.asarray(
        prob_sample(module, _bf16(params), cond, timbre, mask, rng, 8, 0.3)
    ).astype(np.float32)

    rel = float(
        np.linalg.norm(lat32 - lat16) / (np.linalg.norm(lat32) + 1e-9)
    )
    print(f"denoiser bf16 rel latent err = {rel:.4f}")
    assert rel < 0.05, f"bf16 denoiser drifted: rel {rel:.3f}"
