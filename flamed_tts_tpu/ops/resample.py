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


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """2x (or ratio-x) FIR upsampling (reference resample.py:9-36)."""
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    c = x.shape[-1]
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    # Depthwise transposed conv: torch layout (C_in, C_out/g=1, K).
    w = jnp.asarray(filt)[None, None, :] * jnp.ones((c, 1, 1), dtype=jnp.float32)
    x = replicate_pad(x, pad, pad)
    out = ratio * conv_transpose1d(x, w, stride=stride, padding=0, groups=c)
    return out[:, pad_left:-pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """ratio-x FIR decimation (reference resample.py:40-57, filter.py:60-96)."""
    if kernel_size is None:
        kernel_size = int(6 * ratio // 2) * 2
    c = x.shape[-1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    w = jnp.asarray(filt)[None, None, :] * jnp.ones((c, 1, 1), dtype=jnp.float32)
    x = replicate_pad(x, pad_left, pad_right)
    return conv1d(x, w, stride=ratio, padding=0, groups=c)


def snake_filtered_reference(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Activation1d: 2x upsample -> SnakeBeta -> 2x downsample
    (reference act.py:7-29), literal conv_transpose / strided-conv form."""
    x = upsample1d(x, 2)
    x = snake_beta(x, alpha, beta, logscale=True)
    return downsample1d(x, 2)


def _up2_polyphase_filters() -> tuple:
    """Split the k=12 upsampling filter into its two phase branches."""
    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    return f[1::2].copy(), f[0::2].copy()  # even-output taps, odd-output taps


def snake_filtered(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Fused polyphase up(2x)-snake-down(2x), bit-equivalent to
    ``snake_filtered_reference`` (up to fp reassociation).

    Derivation from the reference arithmetic (resample.py:9-57): with
    replicate padding folded in,

      ye[t] = 2 * sum_k f_up[2k+1] * x[clip(t+2-k, 0, T-1)]   (even phase)
      yo[t] = 2 * sum_k f_up[2k]   * x[clip(t+3-k, 0, T-1)]   (odd phase)
      s     = snake(interleave(ye, yo))       (never materialized)
      z[t]  = sum_j f_dn[j] * s[clip(2t+j-5, 0, 2T-1)]

    Expressed as static shifted slices of edge-padded buffers — the 2x
    intermediate never exists, and XLA sees pure fusable VPU adds instead
    of a conv_transpose + strided grouped conv pair.  The <=3 boundary
    frames where the interleaved clip crosses phases are patched exactly.
    """
    b, t_len, c = x.shape
    f_e, f_o = _up2_polyphase_filters()
    f_dn = kaiser_sinc_filter1d(0.25, 0.3, 12)

    x_e = jnp.pad(x, ((0, 0), (3, 2), (0, 0)), mode="edge")
    x_o = jnp.pad(x, ((0, 0), (2, 3), (0, 0)), mode="edge")

    ye = sum(
        2.0 * float(f_e[k]) * jax.lax.dynamic_slice_in_dim(x_e, 5 - k, t_len, 1)
        for k in range(6)
    )
    yo = sum(
        2.0 * float(f_o[k]) * jax.lax.dynamic_slice_in_dim(x_o, 5 - k, t_len, 1)
        for k in range(6)
    )

    ye = snake_beta(ye, alpha, beta, logscale=True)
    yo = snake_beta(yo, alpha, beta, logscale=True)

    # Downsample: z[t] = sum over 12 taps, selecting phase by parity of
    # (2t + j - 5):  odd j -> ye[t + (j-5)/2], even j -> yo[t + (j-6)/2].
    ye_p = jnp.pad(ye, ((0, 0), (2, 3), (0, 0)), mode="edge")
    yo_p = jnp.pad(yo, ((0, 0), (3, 2), (0, 0)), mode="edge")
    z = jnp.zeros_like(x)
    for j in range(12):
        if j % 2 == 1:
            off = (j - 5) // 2  # in [-2, 3]
            z = z + float(f_dn[j]) * jax.lax.dynamic_slice_in_dim(ye_p, off + 2, t_len, 1)
        else:
            off = (j - 6) // 2  # in [-3, 2]
            z = z + float(f_dn[j]) * jax.lax.dynamic_slice_in_dim(yo_p, off + 3, t_len, 1)

    # Boundary patch: replicate padding acts on the *interleaved* signal,
    # so out-of-range taps must replicate s[0] = ye[0] / s[-1] = yo[-1],
    # not the per-phase edges used above.  Only |t| < 3 from each end can
    # differ; recompute those exactly.
    def exact_rows(ts):
        rows = []
        for t in ts:
            acc = 0.0
            for j in range(12):
                i = min(max(2 * t + j - 5, 0), 2 * t_len - 1)
                src = ye[:, i // 2, :] if i % 2 == 0 else yo[:, i // 2, :]
                acc = acc + float(f_dn[j]) * src
            rows.append(acc)
        return jnp.stack(rows, axis=1)

    head = exact_rows(range(min(3, t_len)))
    tail_ts = range(max(t_len - 3, 0), t_len)
    tail = exact_rows(tail_ts)
    z = jnp.concatenate(
        [head, z[:, head.shape[1] : t_len - tail.shape[1], :], tail], axis=1
    )
    return z
