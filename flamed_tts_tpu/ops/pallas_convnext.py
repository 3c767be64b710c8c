"""Pallas TPU kernel: fused depthwise conv-31 + masked channel instance
norm (+ affine) — the ConvNeXt inner op of the denoiser.

Per Euler step the denoiser runs 5 of these (4 ResBlocks + FinalLayer,
SURVEY §2.4); in XLA the depthwise conv lowers to a VPU conv and the
GroupNorm(C, C) to a separate two-pass reduction, each round-tripping the
(L, C) activation through HBM.  This kernel keeps the activation in VMEM
for the whole conv -> stats -> normalize -> affine chain:

  y[l, c]   = sum_k w[k, c] * x[l + k - P, c]          (zero padded)
  mu[c]     = mean_{l < n} y[l, c]
  var[c]    = mean_{l < n} (y[l, c] - mu[c])^2
  out[l, c] = (y[l, c] - mu[c]) / sqrt(var + eps) * scale[c] + bias[c]
  out[l >= n] = 0

The conv is expressed as K static shifted slices of a padded VMEM
scratch buffer — 31 VPU multiply-adds, no im2col, no HBM traffic.
Masking matches ops/norms.py: statistics over valid frames only, so
bucketed runs equal exact-length runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_ref, x_ref, w_ref, scale_ref, bias_ref, out_ref, xpad_ref, *, kernel_size: int, eps: float):
    l, c = x_ref.shape
    pad = (kernel_size - 1) // 2
    n = n_ref[0]

    # Zero the padded frames of the input and stage it into the padded
    # scratch so every window sees zeros beyond the valid range.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    valid = row_ids < n
    xpad_ref[:, :] = jnp.zeros_like(xpad_ref)
    xpad_ref[pl.ds(pad, l), :] = jnp.where(valid, x_ref[:, :], 0.0)

    acc = jnp.zeros((l, c), dtype=jnp.float32)
    for k in range(kernel_size):
        acc = acc + xpad_ref[pl.ds(k, l), :].astype(jnp.float32) * w_ref[k, :].astype(jnp.float32)

    inv_n = 1.0 / jnp.maximum(n.astype(jnp.float32), 1.0)
    masked = jnp.where(valid, acc, 0.0)
    mean = jnp.sum(masked, axis=0, keepdims=True) * inv_n
    centered = jnp.where(valid, acc - mean, 0.0)
    var = jnp.sum(centered * centered, axis=0, keepdims=True) * inv_n
    normed = centered * jax.lax.rsqrt(var + eps)
    out = normed * scale_ref[0, :].astype(jnp.float32) + bias_ref[0, :].astype(jnp.float32)
    out_ref[:, :] = jnp.where(valid, out, 0.0).astype(out_ref.dtype)


def depthwise_conv_instance_norm(
    x: jnp.ndarray,        # (B, L, C)
    weight: jnp.ndarray,   # (K, C) depthwise taps (flax kernel[:, 0, :])
    scale: jnp.ndarray,    # (C,)
    bias: jnp.ndarray,     # (C,)
    lengths: jnp.ndarray,  # (B,) valid frame counts
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Fused conv31+norm for one batch of sequences (vmapped over B)."""
    b, l, c = x.shape
    k = weight.shape[0]

    kern = partial(_kernel, kernel_size=k, eps=eps)

    def one(x_i, n_i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((l, c), x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((l + k - 1, c), x.dtype)],
        )(
            n_i.reshape(1).astype(jnp.int32),
            x_i,
            weight.astype(x.dtype),
            scale.reshape(1, c).astype(x.dtype),
            bias.reshape(1, c).astype(x.dtype),
        )

    return jax.vmap(one)(x, lengths)


def reference_conv_instance_norm(x, weight, scale, bias, lengths, eps=1e-5):
    """XLA reference implementation (for tests/benchmarks)."""
    from flamed_tts_tpu.ops.norms import masked_group_norm

    b, l, c = x.shape
    k = weight.shape[0]
    pad_mask = jnp.arange(l)[None, :] >= lengths[:, None]
    h = jnp.where(pad_mask[:, :, None], 0.0, x)
    h = jax.lax.conv_general_dilated(
        h,
        weight[:, None, :],  # (K, 1, C) WIO with feature groups
        window_strides=(1,),
        padding=[((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    return masked_group_norm(h, c, scale, bias, pad_mask=pad_mask, eps=eps)
