"""Length -> padding-mask utilities (reference: flamed/utils/tools.py:91-99).

Convention matches the reference throughout: ``mask[b, t] == True`` means
position ``t`` of batch element ``b`` is PADDING.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Boolean (B, max_len) mask; True = padded position."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids >= lengths[:, None]


def lengths_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(~mask, axis=-1)


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """Zero (or fill) masked positions; mask broadcast over trailing dims."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)
