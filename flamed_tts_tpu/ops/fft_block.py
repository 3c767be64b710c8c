"""FFT blocks: masked self-attention + conv feed-forward (post-LN).

TPU-native re-design of the FastSpeech2-lineage transformer stack
(reference: flamed/models/module/transformer/{Layers,SubLayers,Modules}.py).
Differences from the reference implementation, none of which change the
math for valid positions:

* attention runs as one batched einsum over heads (MXU-friendly) instead
  of per-head (n*b, l, d) reshapes;
* masking uses a large negative fill (exp underflows to exactly 0 in
  fp32) instead of ``-inf`` so fully-masked padding rows yield finite
  garbage that is then explicitly zeroed, rather than NaNs;
* positions are *gathered by id* from the sinusoid table, which lets a
  statically padded [prompt ‖ target] layout reproduce the reference's
  exact-length position numbering (see prior_generator.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from flamed_tts_tpu.ops.masking import apply_mask

_NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (SubLayers.py:8-57 semantics)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l, _ = x.shape
        residual = x
        q = nn.Dense(self.n_head * self.d_k, name="w_qs")(x)
        k = nn.Dense(self.n_head * self.d_k, name="w_ks")(x)
        v = nn.Dense(self.n_head * self.d_v, name="w_vs")(x)

        q = q.reshape(b, l, self.n_head, self.d_k)
        k = k.reshape(b, l, self.n_head, self.d_k)
        v = v.reshape(b, l, self.n_head, self.d_v)

        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(
            jnp.asarray(self.d_k, dtype=x.dtype)
        )
        if attn_mask is not None:
            # attn_mask: (B, Lq, Lk) True = disallowed key.
            scores = jnp.where(attn_mask[:, None, :, :], _NEG_INF, scores)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(
            b, l, self.n_head * self.d_v
        )
        out = nn.Dense(self.d_model, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)


class ConvFeedForward(nn.Module):
    """Two-conv position-wise FFN with post-LN (SubLayers.py:60-93)."""

    d_in: int
    d_hid: int
    kernel_sizes: tuple
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        k0, k1 = self.kernel_sizes
        out = nn.Conv(
            self.d_hid, kernel_size=(k0,), padding=[(int((k0 - 1) // 2),) * 2],
            name="w_1",
        )(x)
        out = nn.relu(out)
        out = nn.Conv(
            self.d_in, kernel_size=(k1,), padding=[(int((k1 - 1) // 2),) * 2],
            name="w_2",
        )(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)


class FFTBlock(nn.Module):
    """Self-attention + conv-FFN with zero-masking after each sublayer
    (Layers.py:11-30)."""

    d_model: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    kernel_sizes: tuple
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if attn_mask is None:
            # Key-padding-only mask, as in the reference (Models.py:79):
            # padded query rows produce garbage that apply_mask zeroes.
            attn_mask = jnp.broadcast_to(
                pad_mask[:, None, :], (x.shape[0], x.shape[1], x.shape[1])
            )
        out = MultiHeadAttention(
            n_head=self.n_head,
            d_model=self.d_model,
            d_k=self.d_k,
            d_v=self.d_v,
            dropout=self.dropout,
            name="slf_attn",
        )(x, attn_mask, deterministic=deterministic)
        out = apply_mask(out, pad_mask)
        out = ConvFeedForward(
            d_in=self.d_model,
            d_hid=self.d_inner,
            kernel_sizes=tuple(self.kernel_sizes),
            dropout=self.dropout,
            name="pos_ffn",
        )(out, deterministic=deterministic)
        return apply_mask(out, pad_mask)
