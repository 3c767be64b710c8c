"""Gather-based length regulation with silence interleaving.

The reference expands phoneme frames with ``torch.repeat_interleave`` into
a data-dependent-length buffer (reference: flamed/models/synthesizer/
pva.py:125-166) — the central dynamic-shape obstacle for TPU.  Here the
expansion is re-designed as a static-shape gather:

  1. build the interleaved repeat vector r = [d_0, s_0, d_1, s_1, ...]
     of length 2L (phone durations d, trailing-silence durations s; the
     silence frame is the utterance's first encoded frame, pva.py:142);
  2. cumulative-sum r;
  3. every output slot j in [0, max_len) finds its source segment with a
     branchless ``searchsorted`` over the cumsum and gathers that row.

Identical output to the reference for valid slots; slots beyond the
sampled target length are zero.  One deliberate deviation: padded phoneme
positions contribute 0 repeats here, whereas the reference's
``clamp(min=1)`` runs after zeroing so each *padded* phoneme leaks one
zero-frame into the target in its batch mode (pva.py:136-137).  Under
bucketed padding that quirk would corrupt even single utterances, so it
is not reproduced.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def interleaved_repeats(
    phone_dur: jnp.ndarray,
    sil_dur: jnp.ndarray,
    src_lens: jnp.ndarray,
) -> jnp.ndarray:
    """(B, 2L) int32 interleaved [phone, sil] repeat counts.

    Valid phones repeat >= 1; silences >= 0; padded positions 0.
    """
    b, l = phone_dur.shape
    valid = jnp.arange(l, dtype=src_lens.dtype)[None, :] < src_lens[:, None]
    phone_rep = jnp.clip(jnp.round(phone_dur.astype(jnp.float32)), 1, None)
    phone_rep = jnp.where(valid, phone_rep, 0.0).astype(jnp.int32)
    sil_rep = jnp.clip(jnp.round(sil_dur.astype(jnp.float32)), 0, None)
    sil_rep = jnp.where(valid, sil_rep, 0.0).astype(jnp.int32)
    return jnp.stack([phone_rep, sil_rep], axis=2).reshape(b, 2 * l)


def length_regulate(
    x: jnp.ndarray,
    phone_dur: jnp.ndarray,
    sil_dur: jnp.ndarray,
    src_lens: jnp.ndarray,
    max_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, L, H) phoneme frames to (B, max_len, H) code frames.

    Returns (expanded, tgt_len).  ``tgt_len`` is clipped to ``max_len``;
    callers choose buckets so that clipping never triggers in practice.
    """
    b, l, _ = x.shape
    repeats = interleaved_repeats(phone_dur, sil_dur, src_lens)
    csum = jnp.cumsum(repeats, axis=1)  # (B, 2L)
    tgt_len = jnp.minimum(csum[:, -1], max_len)

    slots = jnp.arange(max_len, dtype=jnp.int32)
    # Segment index for each output slot: the first segment whose cumsum
    # exceeds j, i.e. #{i : csum[i] <= j}.  A dense comparison-count beats
    # searchsorted here: no sort network, one (B, 2L, max_len) reduce that
    # XLA maps straight onto the VPU.
    seg = jnp.sum(
        csum[:, :, None] <= slots[None, None, :], axis=1, dtype=jnp.int32
    )  # (B, max_len), values in [0, 2L]
    seg = jnp.minimum(seg, 2 * l - 1)

    phone_idx = seg // 2
    is_sil = (seg % 2) == 1
    # Silence frames gather the utterance's first encoded frame (pva.py:142).
    src_idx = jnp.where(is_sil, 0, phone_idx)

    out = jnp.take_along_axis(x, src_idx[:, :, None], axis=1)
    valid_out = slots[None, :] < tgt_len[:, None]
    out = jnp.where(valid_out[:, :, None], out, 0.0)
    return out, tgt_len
