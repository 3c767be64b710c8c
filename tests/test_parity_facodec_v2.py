"""Numerical parity: V2 codec (prosody-from-mel) vs the reference classes.

Constructs the actual FACodecEncoderV2/FACodecDecoderV2
(reference facodec.py:834-1285), converts their state_dicts, and compares
the full voice-conversion assembly end to end (VERDICT round-1 item 6).

Note the reference defaults (vq_dim=1024 with in_channels=256) are
internally inconsistent — its quantize() would feed a 256-d melspec
encoding into a 1024-d in_proj; the classes are never instantiated by any
reference entry point.  The test uses the consistent vq_dim=256.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from tests.parity_utils import assert_close
from tests.reference_loader import load_reference
from tools.convert_torch_ckpt import (
    convert_facodec_decoder_v2,
    convert_facodec_encoder_v2,
)

from flamed_tts_tpu.models.facodec.extras import (
    decoder_v2_inference,
    decoder_v2_quantize,
    decoder_v2_vq2emb,
    encoder_v2_forward,
    encoder_v2_prosody_feature,
    v2_voice_conversion,
)
from flamed_tts_tpu.models.facodec.timbre import timbre_encoder_forward

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')

ENC_UP = (2, 4, 5, 5)  # hop 200 so codec frames align with the mel grid
DEC_UP = (5, 5, 4, 2)


@pytest.fixture(scope="module")
def v2():
    ref = load_reference()
    torch.manual_seed(7)
    enc = ref.facodec.FACodecEncoderV2(
        ngf=8, up_ratios=list(ENC_UP), out_channels=256
    ).eval()
    dec = ref.facodec.FACodecDecoderV2(
        in_channels=256,
        upsample_initial_channel=64,
        ngf=8,
        up_ratios=list(DEC_UP),
        vq_num_q_c=2,
        vq_num_q_p=1,
        vq_num_q_r=3,
        vq_dim=256,
        codebook_dim=8,
        codebook_size_prosody=3,
        codebook_size_content=3,
        codebook_size_residual=3,
    ).eval()
    enc_params = convert_facodec_encoder_v2(enc.state_dict())
    dec_params = convert_facodec_decoder_v2(dec.state_dict())
    rng = np.random.RandomState(0)
    wav_src = (0.3 * rng.randn(1, 16000)).astype(np.float32)
    wav_tgt = (0.3 * rng.randn(1, 16000)).astype(np.float32)
    return enc, dec, enc_params, dec_params, wav_src, wav_tgt


def _analyze_ref(enc, dec, wav):
    with torch.no_grad():
        x = torch.from_numpy(wav)[:, None, :]
        a = enc(x)                                    # (B, 256, T)
        p = enc.get_prosody_feature(x)                # (B, 20, Tm)
        p = p[:, :, : a.shape[2]]
        outs, qs, commit, qbuf, spk = dec(a, p, vq=True, eval_vq=True)
    return a, p, qs, spk


def test_encoder_v2_parity(v2):
    enc, dec, enc_params, dec_params, wav_src, _ = v2
    a_ref, p_ref, _, _ = _analyze_ref(enc, dec, wav_src)
    a = encoder_v2_forward(enc_params, jnp.asarray(wav_src)[:, :, None], ENC_UP)
    assert_close(np.asarray(a), a_ref.numpy().transpose(0, 2, 1), atol=2e-4)
    p = encoder_v2_prosody_feature(jnp.asarray(wav_src))[:, :, : a.shape[1]]
    assert_close(np.asarray(p), p_ref.numpy(), atol=2e-3)


def test_quantize_v2_parity(v2):
    enc, dec, enc_params, dec_params, wav_src, _ = v2
    a_ref, p_ref, qs_ref, spk_ref = _analyze_ref(enc, dec, wav_src)
    a = jnp.asarray(a_ref.numpy().transpose(0, 2, 1))  # isolate quantizer
    p = jnp.asarray(p_ref.numpy())
    codes, spk = decoder_v2_quantize(dec_params, a, p)
    np.testing.assert_array_equal(np.asarray(codes), qs_ref.numpy())
    assert_close(np.asarray(spk), spk_ref.numpy(), atol=2e-4)


def test_vc_assembly_parity(v2):
    enc, dec, enc_params, dec_params, wav_src, wav_tgt = v2
    # reference assembly: source codes (prosody+content), target timbre
    a_src, p_src, qs_src, _ = _analyze_ref(enc, dec, wav_src)
    _, _, _, spk_tgt = _analyze_ref(enc, dec, wav_tgt)
    with torch.no_grad():
        x_emb = dec.vq2emb(qs_src, use_residual=False)
        wav_ref = dec.inference(x_emb, spk_tgt)

    wav = v2_voice_conversion(
        enc_params,
        dec_params,
        jnp.asarray(wav_src)[:, :, None],
        jnp.asarray(wav_tgt)[:, :, None],
        ENC_UP,
        DEC_UP,
        use_residual=False,
    )
    assert wav.shape[1] == wav_ref.shape[2]
    assert_close(np.asarray(wav)[:, :, 0], wav_ref.numpy()[:, 0, :], atol=5e-3)


def test_vq2emb_inference_isolated(v2):
    enc, dec, enc_params, dec_params, wav_src, _ = v2
    _, _, qs_src, spk_src = _analyze_ref(enc, dec, wav_src)
    with torch.no_grad():
        x_ref = dec.vq2emb(qs_src, use_residual=True)
        wav_ref = dec.inference(x_ref, spk_src)
    x = decoder_v2_vq2emb(dec_params, jnp.asarray(qs_src.numpy()), use_residual=True)
    assert_close(np.asarray(x), x_ref.numpy().transpose(0, 2, 1), atol=2e-4)
    wav = decoder_v2_inference(dec_params, x, jnp.asarray(spk_src.numpy()), DEC_UP)
    assert_close(np.asarray(wav)[:, :, 0], wav_ref.numpy()[:, 0, :], atol=5e-3)
