"""Mask-aware normalization ops.

The reference applies ``torch.nn.GroupNorm`` over (channels, time) slices
(e.g. GroupNorm(C, C) inside ConvNeXt blocks, prob_generator.py:89, and
GroupNorm(8, C) in the condition downsampler, prob_generator.py:187).
GroupNorm statistics span the *time* axis, so under static-shape bucketing
padded frames would pollute the statistics of valid frames.  These masked
variants compute statistics over valid frames only, which makes a padded
run bit-equivalent (up to fp reassociation) to the reference's exact-length
run.  With ``mask=None`` they reduce to the plain ops.

Layout: channel-last (B, L, C) everywhere — TPU-friendly (C maps to lanes).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def masked_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pad_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over (group-channels x valid-time) of a (B, L, C) tensor.

    ``pad_mask``: (B, L) bool, True = padding.  ``scale``/``bias``: (C,).
    Matches torch.nn.GroupNorm (biased variance) on unpadded inputs.
    """
    b, l, c = x.shape
    g = num_groups
    xg = x.reshape(b, l, g, c // g).astype(jnp.float32)
    if pad_mask is not None:
        valid = (~pad_mask)[:, :, None, None].astype(jnp.float32)
        n = jnp.maximum(valid.sum(axis=1, keepdims=True) * (c // g), 1.0)
        mean = (xg * valid).sum(axis=(1, 3), keepdims=True) / n
        var = (((xg - mean) ** 2) * valid).sum(axis=(1, 3), keepdims=True) / n
    else:
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    out = xg.reshape(b, l, c).astype(x.dtype)
    out = out * scale[None, None, :] + bias[None, None, :]
    if pad_mask is not None:
        out = jnp.where(pad_mask[:, :, None], 0.0, out)
    return out


class MaskedGroupNorm(nn.Module):
    """Parameterized masked GroupNorm (affine, torch-compatible)."""

    num_groups: int
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return masked_group_norm(
            x, self.num_groups, scale, bias, pad_mask=pad_mask, eps=self.eps
        )


def layer_norm_noaffine(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-position LayerNorm without learned affine (torch
    elementwise_affine=False)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)
