"""Native C++ WAV codec vs the scipy path."""

import io
import os
import subprocess

import numpy as np
import pytest
from scipy.io import wavfile

from flamed_tts_tpu.utils import native_audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    lib = native_audio._get_lib()
    if lib is None:
        pytest.skip("native wavio not buildable in this environment")
    return lib


def _wav_bytes(data, sr=16000):
    buf = io.BytesIO()
    wavfile.write(buf, sr, data)
    return buf.getvalue()


def test_decode_pcm16(lib):
    rng = np.random.RandomState(0)
    pcm = (rng.randn(1000) * 8000).astype(np.int16)
    out = native_audio.decode_wav(_wav_bytes(pcm, 22050))
    assert out is not None
    wav, sr = out
    assert sr == 22050
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-6)


def test_decode_stereo_mixdown(lib):
    pcm = np.stack(
        [np.full(64, 16000, np.int16), np.full(64, -16000, np.int16)], axis=1
    )
    wav, sr = native_audio.decode_wav(_wav_bytes(pcm))
    np.testing.assert_allclose(wav, np.zeros(64), atol=1e-6)


def test_decode_float32(lib):
    data = (np.sin(np.arange(500) * 0.1) * 0.5).astype(np.float32)
    wav, sr = native_audio.decode_wav(_wav_bytes(data))
    np.testing.assert_allclose(wav, data, atol=1e-6)


def test_encode_roundtrip(lib):
    data = (np.sin(np.arange(300) * 0.05) * 0.7).astype(np.float32)
    blob = native_audio.encode_wav(data, 16000)
    assert blob is not None
    wav, sr = native_audio.decode_wav(blob)
    assert sr == 16000
    np.testing.assert_allclose(wav, data, atol=1e-3)  # 16-bit quantization


def test_malformed_rejected(lib):
    assert native_audio.decode_wav(b"not a wav file at all") is None


def test_load_wav_uses_native_and_matches_scipy(lib, tmp_path):
    from flamed_tts_tpu.utils.audio import load_wav

    pcm = (np.sin(np.arange(16000) * 0.03) * 12000).astype(np.int16)
    path = str(tmp_path / "t.wav")
    wavfile.write(path, 16000, pcm)
    wav = load_wav(path, 16000)
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-6)
