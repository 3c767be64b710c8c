"""Pallas TPU kernel: fused alias-free Snake (2x up -> snake -> 2x down).

The codec wraps every Snake in kaiser-sinc resampling (reference
alias_free_torch); those FIR chains dominate FaCodec decode wall time
(~100 ms of ~140 ms at 10 s of audio) and every XLA formulation measured
slow — grouped conv, channels-into-batch, and shifted slices alike.

This kernel computes the whole chain per (time-tile, all-channels) block
entirely in VMEM using the polyphase decomposition, so the 2x-rate
intermediate never exists and each output element costs ~30 VPU FMAs +
one sin:

  ye[t] = 2 sum_k f_up[2k+1] x~[t+3..t+8]      (even phase, 6 taps)
  yo[t] = 2 sum_k f_up[2k]   x~[t+4..t+9]      (odd phase, 6 taps)
  s     = snake_beta(ye), snake_beta(yo)
  z[t]  = sum_{j odd} f_dn[j] ye[t+(j-5)/2] + sum_{j even} f_dn[j] yo[t+(j-6)/2]

where x~ is the input edge-padded by 6.  The <=3 frames at each global
edge (where the reference's replicate padding acts on the *interleaved*
signal) are recomputed exactly by the host-side wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flamed_tts_tpu.ops.resample import kaiser_sinc_filter1d, snake_beta


def _filters():
    f_up = kaiser_sinc_filter1d(0.25, 0.3, 12)
    f_dn = kaiser_sinc_filter1d(0.25, 0.3, 12)
    return f_up[1::2].copy(), f_up[0::2].copy(), f_dn


def _kernel(x_cur_ref, x_next_ref, ab_ref, out_ref, *, tile: int, taps):
    """Blocks: x_cur (tile, C) rows [i*tile, ..), x_next (tile, C) the
    following tile (halo source); ab (2, C); out (tile, C).

    BlockSpec windows cannot overlap, so the 12-row halo is read from the
    start of the next block and concatenated in VMEM.
    """
    f_e, f_o, f_dn = taps
    c = x_cur_ref.shape[1]
    alpha = jnp.exp(ab_ref[0, :])[None, :]
    beta = jnp.exp(ab_ref[1, :])[None, :]

    xs = jnp.concatenate([x_cur_ref[:, :], x_next_ref[pl.ds(0, 12), :]], axis=0)

    ye = jnp.zeros((tile + 6, c), jnp.float32)
    yo = jnp.zeros((tile + 6, c), jnp.float32)
    for k in range(6):
        ye = ye + (2.0 * float(f_e[k])) * xs[5 - k : 5 - k + tile + 6, :]
        yo = yo + (2.0 * float(f_o[k])) * xs[6 - k : 6 - k + tile + 6, :]

    ye = ye + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(ye * alpha))
    yo = yo + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(yo * alpha))

    z = jnp.zeros((tile, c), jnp.float32)
    for j in range(12):
        if j % 2 == 1:
            off = (j - 5) // 2  # [-2, 3]
            z = z + float(f_dn[j]) * ye[off + 3 : off + 3 + tile, :]
        else:
            off = (j - 6) // 2  # [-3, 2]
            z = z + float(f_dn[j]) * yo[off + 3 : off + 3 + tile, :]
    out_ref[:, :] = z.astype(out_ref.dtype)


def _exact_edge_rows(x, alpha, beta, rows, t_len):
    """Exact z values at global edge frames (interleaved-clip semantics)."""
    f_e, f_o, f_dn = _filters()
    xp = jnp.pad(x, ((0, 0), (3, 2), (0, 0)), mode="edge")
    xo = jnp.pad(x, ((0, 0), (2, 3), (0, 0)), mode="edge")
    ye = sum(2.0 * float(f_e[k]) * jax.lax.dynamic_slice_in_dim(xp, 5 - k, t_len, 1)
             for k in range(6))
    yo = sum(2.0 * float(f_o[k]) * jax.lax.dynamic_slice_in_dim(xo, 5 - k, t_len, 1)
             for k in range(6))
    ye = snake_beta(ye, alpha, beta)
    yo = snake_beta(yo, alpha, beta)
    outs = []
    for t in rows:
        acc = 0.0
        for j in range(12):
            i = min(max(2 * t + j - 5, 0), 2 * t_len - 1)
            src = ye[:, i // 2, :] if i % 2 == 0 else yo[:, i // 2, :]
            acc = acc + float(f_dn[j]) * src
        outs.append(acc)
    return jnp.stack(outs, axis=1)


def _pick_tile(t_len: int, c: int) -> int:
    """tile * C capped at 64k elements: with ~10 live buffers (double-
    buffered in/out blocks + xs/ye/yo/z) that is ~2.5 MB of VMEM stack,
    comfortably under the 16 MB scoped limit."""
    tile = (2 ** 16) // max(c, 1)
    tile = 1 << int(np.floor(np.log2(max(tile, 128))))
    t_cap = max(128, 1 << int(np.ceil(np.log2(max(t_len, 1)))))
    return int(min(tile, t_cap))


def _run_grid(xp: jnp.ndarray, t_out: int, c: int, ab: jnp.ndarray) -> jnp.ndarray:
    """Run the tiled kernel over ``xp`` (B, >= t_out + 12, c) whose rows
    [0, t_out + 12) hold the (halo-included) input; returns (B, t_out, c)."""
    taps = _filters()
    tile = _pick_tile(t_out, c)
    n_tiles = -(-t_out // tile)
    # Right-pad with zeros so n_tiles+1 whole blocks exist (the last
    # tile's halo reads the start of a zero block).
    xp = jnp.pad(xp, ((0, 0), (0, (n_tiles + 1) * tile - xp.shape[1]), (0, 0)))
    kern = partial(_kernel, tile=tile, taps=taps)

    def one(x_i, ab_i):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, c), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, c), xp.dtype),
        )(x_i, x_i, ab_i)

    return jax.vmap(one, in_axes=(0, None))(xp, ab)[:, :t_out, :]


def _edge_patch(z, x, alpha, beta, t_len, n_tail=3):
    """Replace the global edge rows with the exact interleave-clip values."""
    n_head = min(3, t_len)
    n_tail = min(n_tail, t_len - n_head) if t_len > n_head else 0
    if t_len <= 19 + n_tail:
        head = _exact_edge_rows(x, alpha, beta, range(n_head), t_len)
        tail = _exact_edge_rows(
            x, alpha, beta, range(max(t_len - n_tail, 0), t_len), t_len
        )
    else:
        w = 19 + n_tail
        # Rows 0..2 only reach phase indices < 2w-1 (no right clip), and
        # the last n_tail rows only reach indices > 0 of the right window.
        head = _exact_edge_rows(x[:, :w, :], alpha, beta, range(n_head), w)
        tail = _exact_edge_rows(
            x[:, -w:, :], alpha, beta, range(w - n_tail, w), w
        )
    return jnp.concatenate(
        [head, z[:, head.shape[1] : t_len - tail.shape[1], :], tail], axis=1
    )


def snake_filtered_pallas(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Fused Activation1d, bit-matching ops/resample.py::snake_filtered.

    For c <= 64 the time axis is split into ``128 // c`` chunks laid side
    by side in the lane dimension (halos baked in), so the VPU runs at
    full 128-lane width; each output element sees the identical fp32 op
    sequence, so numerics are unchanged.
    """
    b, t_len, c = x.shape
    fold = 128 // c if (c <= 64 and 128 % c == 0) else 1

    if fold > 1 and t_len >= 4 * fold:
        t_c = -(-t_len // fold)
        t_pad = t_c * fold
        # Replicate-pad: 6-halo left, 6-halo + chunk alignment right.
        xe = jnp.pad(
            x, ((0, 0), (6, 6 + t_pad - t_len), (0, 0)), mode="edge"
        )
        chunks = [
            jax.lax.dynamic_slice_in_dim(xe, j * t_c, t_c + 12, 1)
            for j in range(fold)
        ]
        xpk = jnp.concatenate(chunks, axis=-1)  # (B, t_c + 12, fold*c)
        ab = jnp.stack(
            [
                jnp.tile(jnp.broadcast_to(alpha, (c,)), fold),
                jnp.tile(jnp.broadcast_to(beta, (c,)), fold),
            ]
        )
        zpk = _run_grid(xpk, t_c, fold * c, ab)
        z = jnp.concatenate(
            [zpk[:, :, j * c : (j + 1) * c] for j in range(fold)], axis=1
        )[:, :t_len, :]
        # The padded tail rows fed edge-replicated values into the last
        # few real outputs; widen the exact tail patch to cover them.
        return _edge_patch(z, x, alpha, beta, t_len, n_tail=3 + (t_pad - t_len))

    xp = jnp.pad(x, ((0, 0), (6, 6), (0, 0)), mode="edge")
    ab = jnp.stack([jnp.broadcast_to(alpha, (c,)), jnp.broadcast_to(beta, (c,))])
    z = _run_grid(xp, t_len, c, ab)
    return _edge_patch(z, x, alpha, beta, t_len)
