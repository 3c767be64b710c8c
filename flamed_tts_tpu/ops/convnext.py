"""Attention-free ConvNeXt / adaLN denoiser building blocks.

TPU-native re-design of the reference's DiT-style denoiser components
(flamed/models/synthesizer/prob_generator.py:35-264): depthwise conv-31
ConvNeXt blocks modulated by adaptive LayerNorm, a timestep embedder, and
the DiT final layer.  This stack runs once per Euler step and dominates
inference FLOPs, so everything is channel-last, statically shaped, and
mask-aware (see ops/norms.py for why masking must enter the GroupNorm).

Conventions preserved from the reference:
* GELU is the exact (erf) variant (torch F.gelu default);
* ResBlock LayerNorms are affine with eps 1e-6; FinalLayer norms have no
  affine parameters;
* adaLN modulation order is (shift_conv, scale_conv, gate_conv,
  shift_mlp, scale_mlp[, gate_mlp]).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from flamed_tts_tpu.ops.embeddings import dit_timestep_embedding
from flamed_tts_tpu.ops.norms import MaskedGroupNorm, layer_norm_noaffine

_gelu_exact = partial(nn.gelu, approximate=False)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1.0 + scale) + shift


class DepthwiseConv1D(nn.Module):
    """Per-channel conv along time via K shifted multiply-adds.

    Math- and param-compatible with
    ``nn.Conv(C, (K,), feature_group_count=C)`` (kernel (K, 1, C) +
    bias (C,), cross-correlation, zero padding) but lowered as fused
    elementwise VPU work instead of a grouped convolution: XLA's
    grouped-conv path collapses at batch>4 on TPU (measured 0.235 ->
    38 ms/denoiser-step from batch 1 to 8, 3.3% MXU — the conv turns
    into serialized per-group work), while K shifted slices stay
    bandwidth-bound at every batch size.  Used by every ConvNeXt block
    (the denoiser hot path, once per Euler step).
    """

    features: int
    kernel: int
    padding: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, 1, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        t = x.shape[1]
        xpad = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        kc = k.astype(x.dtype)
        acc = xpad[:, :t, :] * kc[0, 0]
        for i in range(1, self.kernel):
            acc = acc + xpad[:, i : i + t, :] * kc[i, 0]
        return acc + b.astype(x.dtype)


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding -> 2-layer MLP (prob_generator.py:35-72)."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t_freq = dit_timestep_embedding(t, self.frequency_embedding_size)
        h = nn.Dense(self.hidden_size, name="mlp_0")(t_freq)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, name="mlp_2")(h)


class ConvNeXtBlock(nn.Module):
    """Depthwise conv + channel GroupNorm + pointwise MLP, residual
    (prob_generator.py:75-111).  Channel-last; mask-aware."""

    channels: int
    kernel: int = 31
    padding: int = 15
    expand: int = 1
    groups: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        groups = self.groups if self.groups is not None else self.channels
        h = x
        if pad_mask is not None:
            # Zero pads before the depthwise conv so the true-sequence
            # boundary sees zeros, exactly like the reference's conv
            # zero-padding at its (exact) sequence end.
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        if groups == self.channels:
            h = DepthwiseConv1D(
                features=self.channels,
                kernel=self.kernel,
                padding=self.padding,
                name="conv_1",
            )(h)
        else:
            h = nn.Conv(
                self.channels,
                kernel_size=(self.kernel,),
                padding=[(self.padding, self.padding)],
                feature_group_count=groups,
                name="conv_1",
            )(h)
        h = MaskedGroupNorm(
            num_groups=self.channels, channels=self.channels, name="ln_1"
        )(h, pad_mask)
        h = nn.Dense(self.channels * self.expand, name="conv_2")(h)
        h = _gelu_exact(h)
        h = nn.Dense(self.channels, name="conv_3")(h)
        return x + h


class AdaLNResBlock(nn.Module):
    """adaLN-modulated ConvNeXt + gated MLP residual block
    (prob_generator.py:114-164)."""

    channels: int
    convnext_kernel: int = 31
    convnext_padding: int = 15
    convnext_expand: int = 1
    convnext_groups: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        y: Optional[jnp.ndarray],
        pad_mask: Optional[jnp.ndarray] = None,
        mods: Optional[jnp.ndarray] = None,
        mods_only: bool = False,
    ) -> jnp.ndarray:
        if mods_only:
            # Produce this block's modulation tensor for a whole grid of
            # conditioning vectors at once (Euler-loop hoisting: t is a
            # static linspace, so all steps' adaLN outputs batch into one
            # matmul instead of one small matmul per step).
            return nn.Dense(6 * self.channels, name="adaLN_modulation")(nn.silu(y))
        if mods is None:
            mods = nn.Dense(6 * self.channels, name="adaLN_modulation")(nn.silu(y))
        elif self.is_initializing():
            # Touch the Dense during init so its params always exist.
            nn.Dense(6 * self.channels, name="adaLN_modulation")(
                nn.silu(jnp.zeros((1, 1, self.channels)))
            )
        (
            shift_conv,
            scale_conv,
            gate_conv,
            shift_mlp,
            scale_mlp,
            gate_mlp,
        ) = jnp.split(mods, 6, axis=-1)

        h = nn.LayerNorm(epsilon=1e-6, name="ln_conv")(x)
        h = ConvNeXtBlock(
            channels=self.channels,
            kernel=self.convnext_kernel,
            padding=self.convnext_padding,
            expand=self.convnext_expand,
            groups=self.convnext_groups,
            name="conv_in",
        )(modulate(h, shift_conv, scale_conv), pad_mask)
        x = x + gate_conv * h

        h = nn.LayerNorm(epsilon=1e-6, name="ln_mlp")(x)
        h = nn.Dense(self.channels, name="mlp_0")(modulate(h, shift_mlp, scale_mlp))
        h = nn.silu(h)
        h = nn.Dense(self.channels, name="mlp_2")(h)
        return x + gate_mlp * h


class FinalLayer(nn.Module):
    """DiT final layer: adaLN'd ConvNeXt + k3 output conv
    (prob_generator.py:208-264)."""

    model_channels: int
    out_channels: int
    convnext_kernel: int = 31
    convnext_padding: int = 15
    convnext_expand: int = 1
    convnext_groups: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: Optional[jnp.ndarray],
        pad_mask: Optional[jnp.ndarray] = None,
        mods: Optional[jnp.ndarray] = None,
        mods_only: bool = False,
    ) -> jnp.ndarray:
        if mods_only:
            return nn.Dense(5 * self.model_channels, name="adaLN_modulation")(nn.silu(c))
        if mods is None:
            mods = nn.Dense(5 * self.model_channels, name="adaLN_modulation")(nn.silu(c))
        elif self.is_initializing():
            nn.Dense(5 * self.model_channels, name="adaLN_modulation")(
                nn.silu(jnp.zeros((1, 1, self.model_channels)))
            )
        shift_conv, scale_conv, gate_conv, shift_mlp, scale_mlp = jnp.split(
            mods, 5, axis=-1
        )

        h = layer_norm_noaffine(x)
        h = ConvNeXtBlock(
            channels=self.model_channels,
            kernel=self.convnext_kernel,
            padding=self.convnext_padding,
            expand=self.convnext_expand,
            groups=self.convnext_groups,
            name="conv_in",
        )(modulate(h, shift_conv, scale_conv), pad_mask)
        x = x + gate_conv * h

        x = modulate(layer_norm_noaffine(x), shift_mlp, scale_mlp)
        if pad_mask is not None:
            x = jnp.where(pad_mask[:, :, None], 0.0, x)
        return nn.Conv(
            self.out_channels, kernel_size=(3,), padding=[(1, 1)], name="conv_out"
        )(x)
