"""Positional / timestep embedding tables.

Three distinct sinusoid conventions coexist in the reference; all are
reproduced bit-for-bit because trained weights depend on them:

* ``sinusoid_position_table``  — FastSpeech2 table (transformer/Models.py:10-30)
* ``flow_time_embedding``      — PVA SinusoidalPosEmb, sin-then-cos, scale
                                 1000 (synthesizer/pva.py:9-22)
* ``dit_timestep_embedding``   — DiT embedder, cos-then-sin
                                 (synthesizer/prob_generator.py:48-67)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoid_position_table(n_position: int, d_hid: int) -> jnp.ndarray:
    """(n_position, d_hid) float32 FastSpeech2 sinusoid table."""
    positions = np.arange(n_position, dtype=np.float64)[:, None]
    dims = np.arange(d_hid, dtype=np.float64)[None, :]
    angles = positions / np.power(10000.0, 2.0 * (dims // 2) / d_hid)
    table = np.empty((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angles[:, 0::2])
    table[:, 1::2] = np.cos(angles[:, 1::2])
    return jnp.asarray(table, dtype=jnp.float32)


def flow_time_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """PVA-style time embedding: (..., dim) with [sin | cos] halves."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1))
    )
    t = jnp.atleast_1d(t).astype(jnp.float32)
    args = scale * t[..., None] * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def dit_timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """DiT-style time embedding: (..., dim) with [cos | sin] halves.

    ``t`` may be any shape; a frequency axis is appended.
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb
