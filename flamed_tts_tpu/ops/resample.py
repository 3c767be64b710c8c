"""Alias-free activation ops: SnakeBeta + kaiser-windowed sinc resampling.

Re-design of the reference's alias_free_torch package
(flamed/models/facodec/alias_free_torch/{act,filter,resample}.py): every
Snake activation in the codec is wrapped in a 2x kaiser-sinc upsample /
snake / 2x downsample sandwich.  The FIR filters are fixed (no learned
parameters), so they are precomputed with numpy at build time; the
up/downsampling lowers to depthwise strided / input-dilated convs.

This up-snake-down chain is a large fraction of codec FLOPs and a prime
fusion candidate; the XLA path here keeps it as three fusable ops.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.ops.conv1d import conv1d, conv_transpose1d, replicate_pad


def _kaiser_beta(half_size: int, half_width: float) -> float:
    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


@lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """(kernel_size,) float32 normalized kaiser-windowed sinc low-pass
    (reference filter.py:27-57)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    beta = _kaiser_beta(half_size, half_width)
    window = _symmetric_kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size, dtype=np.float64) + 0.5
    else:
        time = np.arange(kernel_size, dtype=np.float64) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _symmetric_kaiser(n: int, beta: float) -> np.ndarray:
    """Symmetric kaiser window of n points (torch periodic=False)."""
    if n == 1:
        return np.ones(1, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)
    alpha = (n - 1) / 2.0
    from numpy import i0

    return i0(beta * np.sqrt(1.0 - ((k - alpha) / alpha) ** 2)) / i0(beta)


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = True) -> jnp.ndarray:
    """SnakeBeta activation x + (1/beta) sin^2(alpha x), channel-last
    (reference facodec.py:57-118).  alpha/beta: (C,)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a = alpha[None, None, :]
    b = beta[None, None, :]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _shared_filter_time_conv(
    x: jnp.ndarray,           # (B, T, C)
    filt: jnp.ndarray,        # (K,) shared across channels
    stride: int = 1,
    lhs_dilation: int = 1,
    padding: tuple = (0, 0),
) -> jnp.ndarray:
    """Depthwise conv along time with one shared filter, lowered as a
    SINGLE-channel conv with channels folded into the batch dimension.

    XLA lowers feature_group_count == C grouped convs very poorly on TPU
    (measured ~100 ms for the codec's FIR chains); (B*C, T, 1) with a
    (K, 1, 1) filter is the fast path.
    """
    b, t, c = x.shape
    xt = jnp.transpose(x, (0, 2, 1)).reshape(b * c, t, 1)
    y = jax.lax.conv_general_dilated(
        xt,
        filt.reshape(-1, 1, 1).astype(x.dtype),
        window_strides=(stride,),
        padding=[padding],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    t2 = y.shape[1]
    return jnp.transpose(y.reshape(b, c, t2), (0, 2, 1))


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """ratio-x FIR upsampling (reference resample.py:9-36 arithmetic)."""
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    k = kernel_size
    stride = ratio
    pad = k // ratio - 1
    pad_left = pad * stride + (k - stride) // 2
    pad_right = pad * stride + (k - stride + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    x = replicate_pad(x, pad, pad)
    # conv_transpose(stride) == input-dilated conv with flipped filter;
    # the kaiser-sinc filter is symmetric, so no flip is needed.
    out = ratio * _shared_filter_time_conv(
        x, filt, lhs_dilation=stride, padding=(k - 1, k - 1)
    )
    return out[:, pad_left:-pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """ratio-x FIR decimation (reference resample.py:40-57, filter.py:60-96)."""
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))
    x = replicate_pad(x, pad_left, pad_right)
    return _shared_filter_time_conv(x, filt, stride=ratio)


def snake_filtered_reference(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """The literal up-snake-down chain in XLA ops."""
    x = upsample1d(x, 2)
    x = snake_beta(x, alpha, beta, logscale=True)
    return downsample1d(x, 2)


def _pallas_available() -> bool:
    if os.environ.get("FLAMED_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def snake_filtered(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Activation1d: 2x upsample -> SnakeBeta -> 2x downsample
    (reference act.py:7-29).

    On TPU this dispatches to the fused Pallas polyphase kernel
    (ops/pallas_resample.py) — measured 2x faster end-to-end for the
    codec decoder than any XLA formulation (grouped conv, channels-into-
    batch, shifted slices).  CPU (and FLAMED_NO_PALLAS=1) uses the XLA
    chain; both are numerically identical.
    """
    if _pallas_available():
        from flamed_tts_tpu.ops.pallas_resample import snake_filtered_pallas

        return snake_filtered_pallas(x, alpha, beta)
    return snake_filtered_reference(x, alpha, beta)
