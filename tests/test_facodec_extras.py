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

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


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


def test_decoder_training_forward_parity():
    """FACodecDecoder.forward(vq=False) — training decode with predictor
    heads + residual masking (facodec.py:509-620) vs the reference."""
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference
    from tools.convert_torch_ckpt import (
        convert_decoder_training_heads,
        convert_facodec_decoder,
    )
    from flamed_tts_tpu.models.facodec.extras import decoder_training_forward

    ref = load_reference()
    torch.manual_seed(11)
    # use_gr_x_timbre stays off: its 245200-way head is too heavy for CPU CI
    dec = ref.facodec.FACodecDecoder(
        in_channels=256,
        upsample_initial_channel=64,
        ngf=8,
        up_ratios=[2, 2, 2, 2],
        vq_num_q_c=2, vq_num_q_p=1, vq_num_q_r=3,
        vq_dim=256, codebook_dim=8,
        codebook_size_prosody=3, codebook_size_content=3, codebook_size_residual=3,
        use_gr_residual_f0=True,
        use_gr_residual_phone=True,
        use_gr_x_timbre=False,
        use_random_mask_residual=False,
    )
    dec = dec.eval()
    params = convert_facodec_decoder(dec.state_dict())
    heads = convert_decoder_training_heads(dec.state_dict())

    rng = np.random.RandomState(3)
    b, t = 2, 32
    quant_t = [torch.from_numpy(rng.randn(b, 256, t).astype(np.float32)) for _ in range(3)]
    spk_t = torch.from_numpy(rng.randn(b, 256).astype(np.float32))
    with torch.no_grad():
        out_ref = dec(
            None, vq=False, quantized=quant_t, speaker_embedding=spk_t
        )

    out = decoder_training_forward(
        params, heads,
        [jnp.asarray(q.numpy().transpose(0, 2, 1)) for q in quant_t],
        jnp.asarray(spk_t.numpy()),
        rng=None,  # mask disabled: keep all residuals (ref use_random_mask_residual=False)
        prob_random_mask_residual=0.0,
        use_gr_residual_f0=True,
        use_gr_residual_phone=True,
        up_ratios=(2, 2, 2, 2),
    )

    np.testing.assert_allclose(
        np.asarray(out["f0"]), out_ref["f0"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["uv"]), out_ref["uv"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["phone"]), out_ref["phone"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["res_f0"]), out_ref["res_f0"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["res_phone"]), out_ref["res_phone"].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["audio"])[:, :, 0], out_ref["audio"].numpy()[:, 0, :],
        atol=5e-3, rtol=1e-3,
    )


def test_analyze_train_matches_eval_codes():
    """With dropout off, the training analysis path must produce the same
    codes as the eval path (straight-through only changes gradients)."""
    import jax
    from flamed_tts_tpu.models.facodec.decoder import analyze, init_decoder_params
    from flamed_tts_tpu.models.facodec.extras import analyze_train

    params = init_decoder_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 256))
    codes_eval, timbre_eval = analyze(params, x)
    outs, codes, losses, buf, timbre = analyze_train(params, x, rng=None)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_eval))
    np.testing.assert_allclose(
        np.asarray(timbre), np.asarray(timbre_eval), atol=1e-6
    )
    assert losses.shape == (6,)
    assert np.isfinite(np.asarray(losses)).all()
    assert len(buf) == 3 and buf[0].shape == (2, 16, 256)
