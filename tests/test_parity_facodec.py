"""Numerical parity: our FaCodec vs the reference (random weights).

Builds the actual reference FACodecEncoder/FACodecDecoder, converts their
state_dicts, and compares latents / codes / timbre / waveform.  Channel
counts are reduced where the reference constructor allows (the timbre
transformer is hardcoded to 256-d, so in_channels stays 256).
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
from tools.convert_torch_ckpt import convert_facodec_decoder, convert_facodec_encoder

from flamed_tts_tpu.models.facodec.encoder import encoder_forward
from flamed_tts_tpu.models.facodec.decoder import analyze, synthesize, vq2emb
from flamed_tts_tpu.ops.masking import mask_from_lengths

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')

UP_RATIOS_ENC = (2, 2, 2, 2)  # hop 16 for fast tests
UP_RATIOS_DEC = (2, 2, 2, 2)


@pytest.fixture(scope="module")
def codec():
    ref = load_reference()
    torch.manual_seed(2)
    ref_enc = ref.facodec.FACodecEncoder(
        ngf=8, up_ratios=list(UP_RATIOS_ENC), out_channels=256
    ).eval()
    ref_dec = ref.facodec.FACodecDecoder(
        in_channels=256,
        upsample_initial_channel=64,
        ngf=8,
        up_ratios=list(UP_RATIOS_DEC),
        vq_num_q_c=2,
        vq_num_q_p=1,
        vq_num_q_r=3,
        vq_dim=256,
        codebook_dim=8,
        codebook_size_prosody=3,
        codebook_size_content=3,
        codebook_size_residual=3,
        use_gr_x_timbre=False,
        use_gr_residual_f0=False,
        use_gr_residual_phone=False,
    ).eval()
    enc_params = convert_facodec_encoder(ref_enc.state_dict())
    dec_params = convert_facodec_decoder(ref_dec.state_dict())
    return ref_enc, ref_dec, enc_params, dec_params


def test_encoder_parity(codec):
    ref_enc, _, enc_params, _ = codec
    rng = np.random.RandomState(11)
    wav = (rng.randn(1, 1, 320) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref_enc(torch.from_numpy(wav)).numpy()  # (1, 256, 20)
    our_lat = encoder_forward(
        enc_params, jnp.asarray(wav.transpose(0, 2, 1)), up_ratios=UP_RATIOS_ENC
    )
    assert_close(
        np.asarray(our_lat).transpose(0, 2, 1), ref_lat, name="latents",
        atol=5e-4, rtol=5e-4,
    )


def test_analyze_parity(codec):
    ref_enc, ref_dec, enc_params, dec_params = codec
    rng = np.random.RandomState(12)
    lat = rng.randn(1, 256, 24).astype(np.float32)
    with torch.no_grad():
        _, ref_codes, _, _, ref_timbre = ref_dec(
            torch.from_numpy(lat), eval_vq=False, vq=True
        )
    codes, timbre = analyze(dec_params, jnp.asarray(lat.transpose(0, 2, 1)))
    np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
    assert_close(timbre, ref_timbre.numpy(), name="timbre", atol=5e-4, rtol=5e-4)


def test_analyze_bucketed_matches_exact(codec):
    """Padded (bucketed) analysis must equal exact-length analysis on the
    valid frames — the static-shape design goal."""
    _, ref_dec, _, dec_params = codec
    rng = np.random.RandomState(13)
    n, bucket = 17, 24
    lat = rng.randn(1, n, 256).astype(np.float32)
    lat_padded = np.zeros((1, bucket, 256), np.float32)
    lat_padded[:, :n] = lat

    codes_exact, timbre_exact = analyze(dec_params, jnp.asarray(lat))
    pad_mask = mask_from_lengths(jnp.asarray([n]), bucket)
    codes_pad, timbre_pad = analyze(dec_params, jnp.asarray(lat_padded), pad_mask)
    np.testing.assert_array_equal(
        np.asarray(codes_pad)[:, :, :n], np.asarray(codes_exact)
    )
    assert_close(timbre_pad, timbre_exact, name="timbre bucketed", atol=1e-4)


def test_vq2emb_parity(codec):
    _, ref_dec, _, dec_params = codec
    rng = np.random.RandomState(14)
    codes = rng.randint(0, 8, (6, 1, 15)).astype(np.int64)
    with torch.no_grad():
        ref_emb = ref_dec.vq2emb(torch.from_numpy(codes)).numpy()  # (1, 256, 15)
    our_emb = vq2emb(dec_params, jnp.asarray(codes.astype(np.int32)))
    assert_close(
        np.asarray(our_emb).transpose(0, 2, 1), ref_emb, name="vq2emb",
        atol=5e-4, rtol=5e-4,
    )


def test_synthesize_parity(codec):
    _, ref_dec, _, dec_params = codec
    rng = np.random.RandomState(15)
    lat = rng.randn(1, 256, 20).astype(np.float32)
    spk = rng.randn(1, 256).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref_dec.inference(
            torch.from_numpy(lat), torch.from_numpy(spk)
        ).numpy()  # (1, 1, 20*16)
    our_wav = synthesize(
        dec_params, jnp.asarray(lat.transpose(0, 2, 1)), jnp.asarray(spk),
        up_ratios=UP_RATIOS_DEC,
    )
    assert_close(
        np.asarray(our_wav).transpose(0, 2, 1), ref_wav, name="wav",
        atol=1e-3, rtol=1e-3,
    )
