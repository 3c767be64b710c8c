"""Log-mel spectrogram (replaces the librosa/torch.stft dependency).

Matches the reference MelSpectrogram (flamed/models/facodec/melspec.py:
39-102): reflect pre-pad by (n_fft - hop)/2, hann window of win_size
zero-padded to n_fft, magnitude sqrt(re^2+im^2+1e-9), slaney-normalized
librosa mel filterbank, log compression with clip 1e-5.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """librosa htk=False (slaney) mel scale."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filterbank
    (librosa.filters.mel equivalent, htk=False, norm='slaney')."""
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(np.array([fmin]))[0], _hz_to_mel(np.array([fmax]))[0], n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_spectrogram(
    wav: jnp.ndarray,           # (B, T) float32
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 16000,
    hop_size: int = 200,
    win_size: int = 800,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """(B, num_mels, frames) log-mel, reference conventions."""
    pad = int((n_fft - hop_size) / 2)
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")

    window = np.hanning(win_size + 1)[:-1]  # periodic hann == torch.hann_window
    lpad = (n_fft - win_size) // 2
    window_full = np.zeros(n_fft, dtype=np.float64)
    window_full[lpad : lpad + win_size] = window
    window_j = jnp.asarray(window_full, dtype=jnp.float32)

    n_frames = 1 + (wav.shape[-1] - n_fft) // hop_size
    idx = (
        np.arange(n_frames)[:, None] * hop_size + np.arange(n_fft)[None, :]
    )
    frames = wav[:, idx] * window_j[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, frames, bins)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)

    mel = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    out = jnp.einsum("mk,bfk->bmf", mel, mag)
    return jnp.log(jnp.clip(out, 1e-5, None))
