"""Pallas TPU kernel: fused FaCodec residual unit.

A residual unit (reference facodec.py:121-133) is

    h = snake_filtered(x, a1, b1)        # alias-free: up2 -> snake -> down2
    h = conv1d(h, w1, b1, pad=3d, dilation=d)   # dense C x C, k=7
    h = snake_filtered(h, a2, b2)
    h = conv1d(h, w2, b2)                # k=1
    out = x + h

The codec encoder runs 12 of these and the decoder 12 more; as separate
XLA ops each stage round-trips the (L, C) activation through HBM —
measured 0.4-2 ms per unit (tools/bench_components.py), ~29 ms of the
~35 ms decode.  This kernel computes the whole unit per time-tile in
VMEM: the two snakes via the polyphase decomposition (the 2x-rate signal
never exists, ops/pallas_resample.py), the convs as 7 shifted MXU dot
slices, one HBM read + one write per tile.

Halo: an output row depends on input rows +-(3d + 12) (6 per snake, 3d
for the dilated conv), so each tile reads that much context from the
neighboring blocks.  Rows within `halo` of a *global* edge see the
snakes' replicate-padding and the convs' zero-padding; the host wrapper
recomputes those few rows with the exact XLA chain and patches them in
(same scheme as snake_filtered_pallas's edge patch).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flamed_tts_tpu.ops.pallas_resample import _filters


def _snake_poly(xs, alpha, beta, n_out, taps):
    """Alias-free SnakeBeta on rows [6, 6 + n_out) of ``xs`` (fp32).

    xs must have n_out + 12 rows; xs[0] is 6 rows before the first output
    row.  Identical math to pallas_resample._kernel.
    """
    f_e, f_o, f_dn = taps
    ye = jnp.zeros((n_out + 6, xs.shape[1]), jnp.float32)
    yo = jnp.zeros((n_out + 6, xs.shape[1]), jnp.float32)
    for k in range(6):
        ye = ye + (2.0 * float(f_e[k])) * xs[5 - k : 5 - k + n_out + 6, :]
        yo = yo + (2.0 * float(f_o[k])) * xs[6 - k : 6 - k + n_out + 6, :]
    ye = ye + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(ye * alpha))
    yo = yo + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(yo * alpha))
    z = jnp.zeros((n_out, xs.shape[1]), jnp.float32)
    for j in range(12):
        if j % 2 == 1:
            off = (j - 5) // 2
            z = z + float(f_dn[j]) * ye[off + 3 : off + 3 + n_out, :]
        else:
            off = (j - 6) // 2
            z = z + float(f_dn[j]) * yo[off + 3 : off + 3 + n_out, :]
    return z


def _unit_kernel(
    x_cur_ref, x_next_ref, ab1_ref, w1_ref, c1b_ref, ab2_ref, w2_ref, c2b_ref,
    out_ref, *, tile: int, halo: int, dilation: int, taps,
):
    """Blocks: x_cur (tile, C) = padded rows [i*tile, ..); x_next the
    following block (halo source, 2*halo <= tile); weights as whole-array
    VMEM blocks.  Output rows [i*tile, i*tile + tile) of the *unpadded*
    array (the wrapper left-pads by `halo`)."""
    c = x_cur_ref.shape[1]
    d = dilation
    io_dtype = out_ref.dtype

    a1 = jnp.exp(ab1_ref[0, :])[None, :]
    b1 = jnp.exp(ab1_ref[1, :])[None, :]
    a2 = jnp.exp(ab2_ref[0, :])[None, :]
    b2 = jnp.exp(ab2_ref[1, :])[None, :]

    xs = jnp.concatenate(
        [x_cur_ref[:, :], x_next_ref[pl.ds(0, 2 * halo), :]], axis=0
    ).astype(jnp.float32)  # rows: tile + 2*halo, xs[0] = x[t0 - halo]

    # snake1: h1[0] = x-row t0 - halo + 6; rows tile + 2*halo - 12
    h1 = _snake_poly(xs, a1, b1, tile + 2 * halo - 12, taps)
    h1 = h1.astype(io_dtype)  # XLA chain feeds the conv in the io dtype

    # conv7 dilated: h2[m] = rows t0 - 6 + m, m in [0, tile + 12)
    acc = jnp.zeros((tile + 12, c), jnp.float32)
    for k in range(7):
        m0 = (k - 3) * d + halo - 12
        acc = acc + jax.lax.dot(
            h1[m0 : m0 + tile + 12, :],
            w1_ref[k, :, :],
            preferred_element_type=jnp.float32,
        )
    h2 = (acc.astype(io_dtype) + c1b_ref[0, :].astype(io_dtype)).astype(jnp.float32)

    # snake2: h3 rows [t0, t0 + tile)
    h3 = _snake_poly(h2, a2, b2, tile, taps).astype(io_dtype)

    # conv1 + residual
    y = jax.lax.dot(h3, w2_ref[:, :], preferred_element_type=jnp.float32)
    y = y.astype(io_dtype) + c2b_ref[0, :].astype(io_dtype)
    out_ref[:, :] = (xs[halo : halo + tile, :].astype(io_dtype) + y).astype(io_dtype)


def _pick_tile(t_len: int, c: int) -> int:
    """Size tiles so the kernel's ~10 live fp32 buffers of
    (tile + 2*halo, C) plus the (7+1) C x C weight blocks stay well under
    the 16 MB scoped-VMEM limit (2^18-element tiles hit the limit at
    C=64: 17.9 M > 16 M, measured on v5e)."""
    budget = 2 ** 17 if c >= 256 else 2 ** 16
    tile = budget // max(c, 1)
    tile = 1 << int(np.floor(np.log2(max(tile, 128))))
    t_cap = max(128, 1 << int(np.ceil(np.log2(max(t_len, 1)))))
    return int(min(tile, t_cap, 4096))


def _xla_unit(x, p, dilation):
    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla

    return residual_unit_xla(x, p, dilation)


def residual_unit_pallas(
    x: jnp.ndarray, p: Dict, dilation: int, tile: int | None = None
) -> jnp.ndarray:
    """Fused residual unit; equals the XLA chain to ~1e-5 (fp32)."""
    b, t_len, c = x.shape
    d = int(dilation)
    halo = 3 * d + 12
    tile = tile or _pick_tile(t_len, c)
    if t_len < 2 * halo or tile < 2 * halo:
        return _xla_unit(x, p, dilation)

    n_tiles = -(-t_len // tile)
    taps = _filters()

    # Left-pad by halo; right-pad so n_tiles + 1 whole blocks exist.
    xp = jnp.pad(x, ((0, 0), (halo, (n_tiles + 1) * tile - t_len - halo), (0, 0)))

    ab1 = jnp.stack(
        [jnp.broadcast_to(p["act1"]["alpha"], (c,)),
         jnp.broadcast_to(p["act1"]["beta"], (c,))]
    ).astype(jnp.float32)
    ab2 = jnp.stack(
        [jnp.broadcast_to(p["act2"]["alpha"], (c,)),
         jnp.broadcast_to(p["act2"]["beta"], (c,))]
    ).astype(jnp.float32)
    w1 = jnp.transpose(p["conv1"]["w"], (2, 1, 0)).astype(x.dtype)  # (7, Cin, Cout)
    w2 = jnp.transpose(p["conv2"]["w"], (2, 1, 0))[0].astype(x.dtype)  # (Cin, Cout)
    c1b = p["conv1"]["b"].reshape(1, c).astype(x.dtype)
    c2b = p["conv2"]["b"].reshape(1, c).astype(x.dtype)

    kern = partial(_unit_kernel, tile=tile, halo=halo, dilation=d, taps=taps)

    def one(x_i):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, c), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((7, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles * tile, c), x.dtype),
        )(x_i, x_i, ab1, w1, c1b, ab2, w2, c2b)

    z = jax.vmap(one)(xp)[:, :t_len, :]

    # Patch the global edges (replicate-pad snakes + zero-pad convs) with
    # the exact XLA chain on small windows.  Valid interior rows are
    # [halo, t_len - halo); windows of 2*halo rows give halo exact rows.
    w = 2 * halo
    head = _xla_unit(x[:, :w, :], p, dilation)[:, :halo, :]
    tail = _xla_unit(x[:, -w:, :], p, dilation)[:, -halo:, :]
    return jnp.concatenate([head, z[:, halo : t_len - halo, :], tail], axis=1)
