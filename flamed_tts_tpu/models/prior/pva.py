"""Probabilistic Variance Adaptor: flow-matching duration + silence models.

Re-design of the reference PVA (flamed/models/synthesizer/pva.py:44-238):
two independent 1-D conditional-flow-matching generators over
log(duration+1), one for phoneme durations and one for per-phoneme
trailing silences ("dynamic pacing").  The fixed-step Euler sampling loop
lives in models/prior/sampling.py as a ``lax.scan`` (static nfe).

Quirk preserved: the reference's second conv uses ``padding=1``
(pva.py:209), which equals SAME padding only because kernel_size is 3 —
reproduced via the same arithmetic.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from flamed_tts_tpu.ops.embeddings import flow_time_embedding


class FlowTimeEmbedding(nn.Module):
    """Sinusoidal(sin|cos, scale 1000) -> Linear -> SiLU -> Linear
    (pva.py:25-41)."""

    hidden_dim: int
    time_scale: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = flow_time_embedding(t, self.hidden_dim, scale=1000.0)
        emb = nn.Dense(self.hidden_dim * self.time_scale, name="mlp_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden_dim, name="mlp_3")(emb)


class ProbabilisticModule(nn.Module):
    """Vector-field estimator v(x_t, enc, t) (pva.py:173-238)."""

    input_size: int
    filter_size: int
    kernel_size: int = 3
    time_scale: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        xt: jnp.ndarray,          # (B, L) current scalar state per phoneme
        encoder_output: jnp.ndarray,  # (B, L, input_size)
        t: jnp.ndarray,           # scalar or (B,)
        pad_mask: Optional[jnp.ndarray],  # (B, L) True = padding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        out = nn.Dense(self.input_size, name="proj")(
            jnp.concatenate([xt[..., None], encoder_output], axis=-1)
        )

        t_emb = FlowTimeEmbedding(
            hidden_dim=self.input_size, time_scale=self.time_scale, name="time_emb"
        )(t)
        # (B_or_1, d) -> broadcast over the phoneme axis.
        out = out + t_emb[..., None, :]

        def zero_pads(h):
            # Padded positions carry noise/time-emb/LN-bias values; zeroing
            # them before each conv makes the conv window at the true
            # sequence boundary see zeros — exactly the zero padding the
            # reference's exact-length run sees.  Keeps bucketed runs
            # bit-equal to unpadded ones.
            if pad_mask is None:
                return h
            return jnp.where(pad_mask[..., None], 0.0, h)

        k = self.kernel_size
        out = nn.Conv(
            self.filter_size, (k,), padding=[((k - 1) // 2,) * 2], name="conv1d_1"
        )(zero_pads(out))
        out = nn.relu(out)
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm_1")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        # Reference uses literal padding=1 for the second conv (pva.py:209).
        out = nn.Conv(
            self.filter_size, (k,), padding=[(1, 1)], name="conv1d_2"
        )(zero_pads(out))
        out = nn.relu(out)
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm_2")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)

        out = nn.Dense(1, name="linear_layer")(out)[..., 0]
        if pad_mask is not None:
            out = jnp.where(pad_mask, 0.0, out)
        return out
