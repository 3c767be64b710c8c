"""Host-side WAV I/O and resampling.

The reference uses librosa/soundfile (synthesize.py:40-43,212); neither is
available here, so 16/24/32-bit PCM and float WAV read/write are implemented
over the stdlib ``wave``-free path (scipy.io.wavfile) with polyphase
resampling via scipy.signal — numerically equivalent to librosa's
``res_type='soxr_hq'`` for our 16 kHz mono use to well below audibility.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

DEFAULT_SR = 16000


def _to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    raise ValueError(f"Unsupported WAV sample dtype: {data.dtype}")


def load_wav(path: str, sr: int = DEFAULT_SR) -> np.ndarray:
    """Load a WAV as mono float32 in [-1, 1] resampled to ``sr``.

    Decoding uses the native C++ codec (native/wavio.cpp) when its
    shared object is available, with this scipy path as fallback."""
    from flamed_tts_tpu.utils import native_audio

    with open(path, "rb") as fin:
        raw = fin.read()
    native = native_audio.decode_wav(raw)
    if native is not None:
        wav, file_sr = native
    else:
        file_sr, data = wavfile.read(path)
        wav = _to_float32(np.asarray(data))
        if wav.ndim == 2:  # (T, channels) -> mono
            wav = wav.mean(axis=1)
    if file_sr != sr:
        g = np.gcd(int(file_sr), int(sr))
        wav = resample_poly(wav, sr // g, file_sr // g).astype(np.float32)
    return np.ascontiguousarray(wav, dtype=np.float32)


def save_wav(path: str, wav: np.ndarray, sr: int = DEFAULT_SR) -> None:
    """Write mono float32 audio as 16-bit PCM."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wav = np.asarray(wav, dtype=np.float32).squeeze()
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    wavfile.write(path, sr, pcm)


def duration_seconds(wav: np.ndarray, sr: int = DEFAULT_SR) -> float:
    return float(np.asarray(wav).squeeze().shape[-1]) / float(sr)


def synth_filename(
    prompt_name: str,
    nsteps_durgen: int,
    nsteps_denoiser: int,
    temp_durgen: float,
    temp_denoiser: float,
) -> Tuple[str, str]:
    """Output naming parity with the reference (synthesize.py:211,237)."""
    stem = os.path.splitext(os.path.basename(prompt_name))[0]
    name = f"{stem}-{nsteps_durgen}-{nsteps_denoiser}-{temp_durgen}-{temp_denoiser}.wav"
    subdir = f"nfe{nsteps_denoiser}-temp{temp_denoiser}"
    return name, subdir
