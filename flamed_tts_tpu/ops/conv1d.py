"""1-D convolution primitives with torch-compatible semantics.

The FaCodec stacks were trained in PyTorch; its checkpoints are converted
(weight-norm folded) but keep torch's weight layouts:

* conv1d weight:          (out, in/groups, k)
* conv_transpose1d weight:(in, out/groups, k)

All activations here are channel-last (B, L, C) — the natural TPU layout —
and convs lower to ``lax.conv_general_dilated`` so XLA can fuse and tile
them onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv1d(
    x: jnp.ndarray,          # (B, L, C_in)
    weight: jnp.ndarray,     # (C_out, C_in // groups, K) torch layout
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int | Tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    if isinstance(padding, int):
        padding = (padding, padding)
    if x.dtype != weight.dtype:
        # The param dtype is the precision knob (cast_inference_params);
        # activations follow it so a bf16-cast codec accepts fp32 inputs.
        x = x.astype(weight.dtype)
    rhs = jnp.transpose(weight, (2, 1, 0))  # (K, I/g, O) == WIO
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, None, :]
    return out


def conv_transpose1d(
    x: jnp.ndarray,          # (B, L, C_in)
    weight: jnp.ndarray,     # (C_in, C_out // groups, K) torch layout
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d equivalent.

    Lowered as an input-dilated forward conv: flip the kernel, swap the
    in/out channel roles per group, dilate the input by ``stride``.
    """
    c_in, c_out_per_g, k = weight.shape
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)  # param dtype wins (see conv1d)
    w = jnp.flip(weight, axis=-1)
    w = w.reshape(groups, c_in // groups, c_out_per_g, k)
    w = jnp.transpose(w, (0, 2, 1, 3))  # (g, O/g, I/g, K)
    w = w.reshape(groups * c_out_per_g, c_in // groups, k)  # (O, I/g, K)
    rhs = jnp.transpose(w, (2, 1, 0))  # WIO
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, None, :]
    return out


def replicate_pad(x: jnp.ndarray, pad_lo: int, pad_hi: int) -> jnp.ndarray:
    """Edge-replicate padding along the length axis of (B, L, C)."""
    return jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)), mode="edge")


def fold_weight_norm(weight_v: np.ndarray, weight_g: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm(v, g) -> g * v / ||v|| (norm over dims 1..)."""
    v = np.asarray(weight_v, dtype=np.float64)
    g = np.asarray(weight_g, dtype=np.float64)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return (g * v / norm).astype(np.float32)
