"""FaCodec auxiliary components: GRL, mel-spec, predictor heads, VQ
training path, redecoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamed_tts_tpu.models.facodec.extras import (
    cnn_predictor,
    fvq_train,
    gradient_reversal,
    init_cnn_predictor,
    init_redecoder_params,
    redecoder_forward,
    rvq_train,
)
from flamed_tts_tpu.ops.melspec import mel_spectrogram, mel_filterbank


def test_gradient_reversal():
    def loss(x):
        return jnp.sum(gradient_reversal(x, 2.0) ** 2) / 2

    x = jnp.asarray([1.0, -3.0])
    grads = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(grads), [-2.0, 6.0])
    np.testing.assert_allclose(np.asarray(gradient_reversal(x, 2.0)), np.asarray(x))


def test_melspec_matches_torch_stft():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32) * 0.1

    ours = np.asarray(mel_spectrogram(jnp.asarray(wav)))

    # reference conventions re-created with torch ops (the reference's
    # melspec module itself imports pyworld/librosa, unavailable here)
    n_fft, hop, win = 1024, 200, 800
    y = torch.nn.functional.pad(
        torch.from_numpy(wav).unsqueeze(1),
        (int((n_fft - hop) / 2), int((n_fft - hop) / 2)),
        mode="reflect",
    ).squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.view_as_real(spec)
    mag = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    mel = torch.from_numpy(mel_filterbank(16000, n_fft, 80, 0.0, 8000.0))
    ref = torch.log(torch.clamp(torch.matmul(mel, mag), min=1e-5)).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_cnn_predictor_heads():
    rng = jax.random.PRNGKey(0)
    params = init_cnn_predictor(rng, indim=16, outdim=5, n_heads=2)
    x = jax.random.normal(rng, (2, 20, 16))
    outs = cnn_predictor(x, params)
    assert len(outs) == 2 and outs[0].shape == (2, 20, 5)
    outs_g = cnn_predictor(x, params, global_pred=True)
    assert outs_g[0].shape == (2, 5)


def test_fvq_train_straight_through():
    rng = jax.random.PRNGKey(1)
    p = {
        "in_proj": {"w": jax.random.normal(rng, (4, 8)) * 0.1, "b": jnp.zeros(4)},
        "out_proj": {"w": jax.random.normal(rng, (8, 4)) * 0.1, "b": jnp.zeros(8)},
        "codebook": jax.random.normal(rng, (16, 4)),
    }
    x = jax.random.normal(rng, (2, 10, 8))

    def loss(x):
        z_q, codes, vq_loss = fvq_train(x, p)
        return jnp.sum(z_q ** 2) + jnp.sum(vq_loss)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # straight-through passes grads


def test_rvq_train_shapes():
    rng = jax.random.PRNGKey(2)
    layers = []
    for i in range(3):
        k = jax.random.fold_in(rng, i)
        layers.append({
            "in_proj": {"w": jax.random.normal(k, (4, 8)) * 0.1, "b": jnp.zeros(4)},
            "out_proj": {"w": jax.random.normal(k, (8, 4)) * 0.1, "b": jnp.zeros(8)},
            "codebook": jax.random.normal(k, (16, 4)),
        })
    x = jax.random.normal(rng, (3, 12, 8))
    q, codes, losses, per_layer = rvq_train(x, layers, rng=rng, quantizer_dropout=0.5)
    assert q.shape == x.shape
    assert codes.shape == (3, 3, 12)
    assert losses.shape == (3,)
    assert per_layer.shape == (3, 3, 12, 8)


def test_redecoder_voice_conversion():
    rng = jax.random.PRNGKey(3)
    params = init_redecoder_params(
        rng, in_channels=256, upsample_initial_channel=64,
        up_ratios=(2, 2, 2, 2), codebook_sizes=(8, 8, 8),
    )
    codes = jax.random.randint(rng, (6, 1, 10), 0, 8)
    spk = jax.random.normal(rng, (1, 256))
    wav = redecoder_forward(params, codes, spk, up_ratios=(2, 2, 2, 2))
    assert wav.shape == (1, 10 * 16, 1)
    assert np.isfinite(np.asarray(wav)).all()
