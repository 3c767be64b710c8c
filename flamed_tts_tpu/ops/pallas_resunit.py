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


def _unit_core(
    xs, ab, w1, c1b, w2, c2b, *, n_out: int, halo: int, dilation: int, taps,
    io_dtype,
):
    """One residual unit on fp32 rows.

    xs: (n_out + 2*halo, C) fp32, halo >= 3*dilation + 12.  Returns
    (n_out, C) fp32 whose row 0 sits at input row ``halo`` — boundary
    values pass through io_dtype exactly like the standalone kernel, so
    stacking cores equals running the kernels back to back.
    """
    c = xs.shape[1]
    d = dilation
    a1 = jnp.exp(ab[0, :])[None, :]
    b1 = jnp.exp(ab[1, :])[None, :]
    a2 = jnp.exp(ab[2, :])[None, :]
    b2 = jnp.exp(ab[3, :])[None, :]

    # snake1: h1[0] = x-row t0 - halo + 6; rows n_out + 2*halo - 12
    h1 = _snake_poly(xs, a1, b1, n_out + 2 * halo - 12, taps)
    h1 = h1.astype(io_dtype)  # XLA chain feeds the conv in the io dtype

    # conv7 dilated: h2[m] = rows t0 - 6 + m, m in [0, n_out + 12)
    acc = jnp.zeros((n_out + 12, c), jnp.float32)
    for k in range(7):
        m0 = (k - 3) * d + halo - 12
        acc = acc + jax.lax.dot(
            h1[m0 : m0 + n_out + 12, :],
            w1[k, :, :],
            preferred_element_type=jnp.float32,
        )
    h2 = (acc.astype(io_dtype) + c1b[0, :].astype(io_dtype)).astype(jnp.float32)

    # snake2: h3 rows [t0, t0 + n_out)
    h3 = _snake_poly(h2, a2, b2, n_out, taps).astype(io_dtype)

    # conv1 + residual
    y = jax.lax.dot(h3, w2[:, :], preferred_element_type=jnp.float32)
    y = y.astype(io_dtype) + c2b[0, :].astype(io_dtype)
    out = xs[halo : halo + n_out, :].astype(io_dtype) + y
    return out.astype(io_dtype).astype(jnp.float32)


def _unit_kernel(
    x_cur_ref, x_next_ref, ab_ref, w1_ref, c1b_ref, w2_ref, c2b_ref,
    out_ref, *, tile: int, halo: int, dilation: int, taps,
):
    """Blocks: x_cur (tile, C) = padded rows [i*tile, ..); x_next the
    following block (halo source, 2*halo <= tile); weights as whole-array
    VMEM blocks.  Output rows [i*tile, i*tile + tile) of the *unpadded*
    array (the wrapper left-pads by `halo`)."""
    io_dtype = out_ref.dtype
    xs = jnp.concatenate(
        [x_cur_ref[:, :], x_next_ref[pl.ds(0, 2 * halo), :]], axis=0
    ).astype(jnp.float32)  # rows: tile + 2*halo, xs[0] = x[t0 - halo]
    out = _unit_core(
        xs, ab_ref[:, :], w1_ref[:, :, :], c1b_ref[:, :], w2_ref[:, :],
        c2b_ref[:, :], n_out=tile, halo=halo, dilation=dilation, taps=taps,
        io_dtype=io_dtype,
    )
    out_ref[:, :] = out.astype(io_dtype)


def _stack_kernel(
    x_cur_ref, x_next_ref, *refs, tile: int, halos, dilations, taps,
):
    """Three residual units fused per tile (decoder/encoder block body):
    the intermediate activations never leave VMEM.  ``refs`` is 5 weight
    refs per unit (ab, w1, c1b, w2, c2b) then out_ref; ``halos[i]`` is
    unit i's per-side context and the wrapper pads by sum(halos)."""
    out_ref = refs[-1]
    io_dtype = out_ref.dtype
    total = sum(halos)
    xs = jnp.concatenate(
        [x_cur_ref[:, :], x_next_ref[pl.ds(0, 2 * total), :]], axis=0
    ).astype(jnp.float32)  # rows: tile + 2*total
    n = tile + 2 * total
    cur = xs
    for i, (h, d) in enumerate(zip(halos, dilations)):
        ab, w1, c1b, w2, c2b = refs[5 * i : 5 * i + 5]
        n = n - 2 * h
        cur = _unit_core(
            cur, ab[:, :], w1[:, :, :], c1b[:, :], w2[:, :], c2b[:, :],
            n_out=n, halo=h, dilation=d, taps=taps, io_dtype=io_dtype,
        )
    out_ref[:, :] = cur.astype(io_dtype)


# --- lane-folded variant (C < 128) -------------------------------------
# The VPU is 8 x 128 lanes and the MXU tiles are 128 wide; at C = 64 the
# plain kernel wastes half of every vector op and at C = 32 three
# quarters.  Folding F = 128 // C consecutive time rows into the lane
# dimension fills the hardware: a folded row m holds original rows
# [F*m, F*m + F).  A time-shift by s original rows then becomes folded
# companion s % F (lanes rotated by (s % F) * C across the row boundary)
# at folded row offset s // F, so every FIR tap / conv tap reads one of F
# precomputed companions.  The dense convs use block-diagonal
# (F*C, F*C) weights: the MXU padded those to 128 wide anyway, so the
# zeros are free and each dot now covers F original rows.


def _companions(x_f, f: int):
    """All F lane-rotated row foldings of ``x_f`` (n, F*C).

    Companion o, row m = original rows [F*m + o, F*m + o + F).  The last
    row of companions o > 0 needs original rows beyond ``x_f``; it is
    filled with junk (zeros) — callers' index math must keep valid
    outputs away from it (asserted in _fir_folded).
    """
    n, fc = x_f.shape
    if f == 1:
        return [x_f]
    c = fc // f
    # Lane-concat of offset slices is unsupported by Mosaic ("offset
    # mismatch on non-concat dimension"); build each companion from two
    # circular rolls + a lane select instead.  Lanes < fc - o*c come from
    # row m's rotated lanes [o*c, fc); the tail lanes wrap to row m+1's
    # lanes [0, o*c) via an additional row roll.
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, fc), 1)
    outs = [x_f]
    for o in range(1, f):
        ra = pltpu.roll(x_f, shift=fc - o * c, axis=1)
        rb = pltpu.roll(ra, shift=n - 1, axis=0)
        outs.append(jnp.where(lane < fc - o * c, ra, rb))
    return outs


def _fir_folded(comps, f: int, shift_coeffs, n_out_f: int):
    """sum_k coeff_k * x[orig_shift_k + t] over folded rows.

    comps: output of _companions.  shift_coeffs: [(orig_shift, coeff)].
    Junk-row safety: companions o > 0 have a junk LAST row, so reads must
    stay at least one row short of the end for o > 0.
    """
    n = comps[0].shape[0]
    acc = None
    for s, cf in shift_coeffs:
        o, r = s % f, s // f
        limit = n if o == 0 else n - 1
        assert r + n_out_f <= limit, (
            f"folded FIR out of bounds: shift {s} (o={o}, r={r}) + "
            f"{n_out_f} rows > {limit}"
        )
        term = cf * comps[o][r : r + n_out_f]
        acc = term if acc is None else acc + term
    return acc


def _snake_folded(x_comps, f, alpha, beta, n_out_f, taps):
    """Folded alias-free SnakeBeta; orig row 0 of the companions' base is
    6 original rows before output row 0 (same convention as _snake_poly).
    alpha/beta are (1, F*C) lane-tiled.  Needs x rows >= n_out_f*f + 12
    (+ one folded junk row of slack for the odd companions).
    """
    f_e, f_o, f_dn = taps
    # ye/yo need n_out + 6 original rows; round up to whole folded rows.
    n_y_f = n_out_f + (6 + f - 1) // f + 1
    ye = _fir_folded(
        x_comps, f, [(5 - k, 2.0 * float(f_e[k])) for k in range(6)], n_y_f
    )
    yo = _fir_folded(
        x_comps, f, [(6 - k, 2.0 * float(f_o[k])) for k in range(6)], n_y_f
    )
    inv_b = 1.0 / (beta + 1e-9)
    ye = ye + inv_b * jnp.square(jnp.sin(ye * alpha))
    yo = yo + inv_b * jnp.square(jnp.sin(yo * alpha))
    ye_c = _companions(ye, f)
    yo_c = _companions(yo, f)
    taps_e = [((j - 5) // 2 + 3, float(f_dn[j])) for j in range(12) if j % 2 == 1]
    taps_o = [((j - 6) // 2 + 3, float(f_dn[j])) for j in range(12) if j % 2 == 0]
    return _fir_folded(ye_c, f, taps_e, n_out_f) + _fir_folded(
        yo_c, f, taps_o, n_out_f
    )


def _unit_core_folded(
    xs, f, ab, w1, c1b, w2, c2b, *, n_out: int, halo: int, dilation: int,
    taps, io_dtype,
):
    """Folded twin of _unit_core: xs fp32 folded ((n_out + 2*halo)/f, F*C)
    -> ((n_out)/f, F*C) fp32; n_out/halo in ORIGINAL rows, both multiples
    of F, halo generous enough for the folded junk-row losses (static
    asserts below / in _fir_folded enforce the exact bounds)."""
    d = dilation
    halo_f = halo // f
    a1 = jnp.exp(ab[0, :])[None, :]
    b1 = jnp.exp(ab[1, :])[None, :]
    a2 = jnp.exp(ab[2, :])[None, :]
    b2 = jnp.exp(ab[3, :])[None, :]

    xs_c = _companions(xs, f)

    tile = n_out
    # snake1 output h1: orig row 0 = t0 - halo + 6.  Must cover conv7's
    # deepest read (h1-relative row (halo - 12 + 3d) + tile + 12 + extra);
    # +3 folded rows absorb the odd-companion junk-row losses (the halo
    # slack added by the wrapper guarantees xs covers these — the static
    # asserts in _fir_folded enforce it).
    n1_f = -(-(tile + halo + 3 * d) // f) + 3
    # Round to io_dtype (XLA-chain parity) but KEEP fp32 storage:
    # pltpu.roll on bf16 operands crashes the Mosaic backend, so the
    # companions are built in fp32 and cast at the MXU dot inputs — the
    # values are already bf16-representable, so the cast is exact.
    h1 = _snake_folded(xs_c, f, a1, b1, n1_f, taps).astype(io_dtype).astype(
        jnp.float32
    )
    h1_c = _companions(h1, f)

    # conv7 dilated: h2 orig row 0 = t0 - 6; tile + 12 rows (+2 folded
    # rows so snake2's folded FIR bounds clear).
    # h2[m] = sum_k w1[k] . h1[m + (k-3)d + halo - 12]  (h1-relative)
    n2_f = (tile + 12) // f + 2
    acc = None
    for k in range(7):
        s = (k - 3) * d + halo - 12
        o, r = s % f, s // f
        limit = h1_c[o].shape[0] - (0 if o == 0 else 1)
        assert 0 <= r and r + n2_f <= limit, (
            f"conv7 folded oob: k={k} s={s} o={o} r={r} n2_f={n2_f} lim={limit}"
        )
        term = jax.lax.dot(
            h1_c[o][r : r + n2_f].astype(io_dtype), w1[k, :, :],
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    h2 = (acc.astype(io_dtype) + c1b[0, :].astype(io_dtype)).astype(jnp.float32)

    # snake2: output rows [t0, t0 + tile)
    h2_c = _companions(h2, f)
    h3 = _snake_folded(h2_c, f, a2, b2, tile // f, taps).astype(io_dtype)

    y = jax.lax.dot(h3, w2[:, :], preferred_element_type=jnp.float32)
    y = y.astype(io_dtype) + c2b[0, :].astype(io_dtype)
    out = xs[halo_f : halo_f + tile // f, :].astype(io_dtype) + y
    return out.astype(io_dtype).astype(jnp.float32)


def _unit_kernel_folded(
    x_cur_ref, x_next_ref, ab_ref, w1_ref, c1b_ref, w2_ref, c2b_ref,
    out_ref, *, tile_f: int, halo: int, fold: int, dilation: int, taps,
):
    """Folded twin of _unit_kernel.  All refs are in folded layout:
    x blocks (tile_f, F*C), weights block-diagonal (F*C, F*C) per tap,
    ab/bias lane-tiled.  ``halo`` is in ORIGINAL rows (multiple of F)."""
    f = fold
    halo_f = halo // f
    io_dtype = out_ref.dtype
    xs = jnp.concatenate(
        [x_cur_ref[:, :], x_next_ref[pl.ds(0, 2 * halo_f), :]], axis=0
    ).astype(jnp.float32)  # folded rows: tile_f + 2*halo_f; orig row 0 = t0 - halo
    out = _unit_core_folded(
        xs, f, ab_ref[:, :], w1_ref[:, :, :], c1b_ref[:, :], w2_ref[:, :],
        c2b_ref[:, :], n_out=tile_f * f, halo=halo, dilation=dilation,
        taps=taps, io_dtype=io_dtype,
    )
    out_ref[:, :] = out.astype(io_dtype)


def _stack_kernel_folded(
    x_cur_ref, x_next_ref, *refs, tile_f: int, halos, fold: int, dilations,
    taps,
):
    """Folded twin of _stack_kernel; halos in ORIGINAL rows (each a
    multiple of F, each covering its unit's context + fold slack)."""
    out_ref = refs[-1]
    f = fold
    io_dtype = out_ref.dtype
    total_f = sum(halos) // f
    xs = jnp.concatenate(
        [x_cur_ref[:, :], x_next_ref[pl.ds(0, 2 * total_f), :]], axis=0
    ).astype(jnp.float32)
    n = tile_f * f + 2 * sum(halos)
    cur = xs
    for i, (h, d) in enumerate(zip(halos, dilations)):
        ab, w1, c1b, w2, c2b = refs[5 * i : 5 * i + 5]
        n = n - 2 * h
        cur = _unit_core_folded(
            cur, f, ab[:, :], w1[:, :, :], c1b[:, :], w2[:, :], c2b[:, :],
            n_out=n, halo=h, dilation=d, taps=taps, io_dtype=io_dtype,
        )
    out_ref[:, :] = cur.astype(io_dtype)


def _blockdiag(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """(C, C) -> block-diagonal (F*C, F*C)."""
    if f == 1:
        return w
    c = w.shape[0]
    eye = jnp.eye(f, dtype=w.dtype)
    return jnp.einsum("ij,ab->iajb", eye, w).reshape(f * c, f * c)


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


def _unit_halo(d: int, fold: int) -> int:
    """Per-side context (ORIGINAL rows) one unit consumes.  Folded
    companions lose one row per level; the +5f slack makes every folded
    FIR bound exact (see the static asserts in _fir_folded)."""
    if fold > 1:
        return -(-(3 * d + 12) // fold) * fold + 5 * fold
    return 3 * d + 12


def _unit_operands(p: Dict, c: int, x_dtype, fold: int):
    """(ab, w1, c1b, w2, c2b) pallas operands for one unit, lane-folded
    when fold > 1.  ab rows: log-alpha1, log-beta1, log-alpha2, log-beta2."""
    ab = jnp.stack(
        [jnp.broadcast_to(p["act1"]["alpha"], (c,)),
         jnp.broadcast_to(p["act1"]["beta"], (c,)),
         jnp.broadcast_to(p["act2"]["alpha"], (c,)),
         jnp.broadcast_to(p["act2"]["beta"], (c,))]
    ).astype(jnp.float32)
    w1 = jnp.transpose(p["conv1"]["w"], (2, 1, 0)).astype(x_dtype)  # (7, Cin, Cout)
    w2 = jnp.transpose(p["conv2"]["w"], (2, 1, 0))[0].astype(x_dtype)  # (Cin, Cout)
    c1b = p["conv1"]["b"].reshape(1, c).astype(x_dtype)
    c2b = p["conv2"]["b"].reshape(1, c).astype(x_dtype)
    if fold > 1:
        f = fold
        ab = jnp.tile(ab, (1, f))
        w1 = jax.vmap(_blockdiag, in_axes=(0, None))(w1, f)  # (7, fc, fc)
        w2 = _blockdiag(w2, f)
        c1b = jnp.tile(c1b, (1, f))
        c2b = jnp.tile(c2b, (1, f))
    return ab, w1, c1b, w2, c2b


def _unit_specs(block_c: int):
    """BlockSpecs matching _unit_operands (whole-array VMEM blocks)."""
    return [
        pl.BlockSpec((4, block_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((7, block_c, block_c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_c, block_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _tiled_call(x, kern, operands, *, tile, halo, fold, n_tiles, c):
    """Shared grid/pad/vmap scaffolding: left-pad by ``halo`` (original
    rows), fold the layout, launch ``kern`` over n_tiles blocks, unfold."""
    b, t_len, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (halo, (n_tiles + 1) * tile - t_len - halo), (0, 0)))
    if fold > 1:
        fc = fold * c
        xp = xp.reshape(b, xp.shape[1] // fold, fc)
        block_rows, block_c = tile // fold, fc
    else:
        block_rows, block_c = tile, c

    specs = [
        pl.BlockSpec((block_rows, block_c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, block_c), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
    ]
    for _ in range(len(operands) // 5):
        specs += _unit_specs(block_c)

    def one(x_i):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (block_rows, block_c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles * block_rows, block_c), x.dtype),
        )(x_i, x_i, *operands)

    z = jax.vmap(one)(xp)
    if fold > 1:
        z = z.reshape(b, n_tiles * tile, c)
    return z[:, :t_len, :]


def residual_unit_pallas(
    x: jnp.ndarray, p: Dict, dilation: int, tile: int | None = None
) -> jnp.ndarray:
    """Fused residual unit; equals the XLA chain to ~1e-5 (fp32)."""
    b, t_len, c = x.shape
    d = int(dilation)
    # Lane fold: pack F = 128 // C consecutive rows into the lane dim so
    # C = 64 / C = 32 shapes fill the 128-wide VPU/MXU (measured ~2x/4x
    # on the decoder's C=64 block, tools/bench_components.py).
    fold = 128 // c if c in (32, 64) else 1
    halo = _unit_halo(d, fold)
    # NOTE: the historical f=2 slack was 4f; _unit_halo standardizes on
    # 5f (one extra folded row pair), which only widens the valid range.
    tile = tile or _pick_tile(t_len, c)
    if t_len < 2 * halo or tile < 2 * halo:
        return _xla_unit(x, p, dilation)

    n_tiles = -(-t_len // tile)
    taps = _filters()
    operands = _unit_operands(p, c, x.dtype, fold)

    if fold > 1:
        kern = partial(
            _unit_kernel_folded,
            tile_f=tile // fold, halo=halo, fold=fold, dilation=d, taps=taps,
        )
    else:
        kern = partial(_unit_kernel, tile=tile, halo=halo, dilation=d, taps=taps)

    z = _tiled_call(x, kern, operands, tile=tile, halo=halo, fold=fold,
                    n_tiles=n_tiles, c=c)

    # Patch the global edges (replicate-pad snakes + zero-pad convs) with
    # the exact XLA chain on small windows.  Valid interior rows are
    # [halo, t_len - halo); windows of 2*halo rows give halo exact rows.
    w = 2 * halo
    head = _xla_unit(x[:, :w, :], p, dilation)[:, :halo, :]
    tail = _xla_unit(x[:, -w:, :], p, dilation)[:, -halo:, :]
    return jnp.concatenate([head, z[:, halo : t_len - halo, :], tail], axis=1)


def residual_stack_pallas(
    x: jnp.ndarray,
    units,
    dilations=(1, 3, 9),
    tile: int | None = None,
) -> jnp.ndarray:
    """Three residual units (one encoder/decoder block body,
    reference facodec.py:121-133 x3) fused into ONE Pallas kernel: the
    two intermediate (T, C) activations never touch HBM.  Matches
    running residual_unit_pallas sequentially bit-for-bit at the io
    dtype (each core rounds its output through io_dtype exactly like
    the standalone kernel boundaries)."""
    b, t_len, c = x.shape
    assert len(units) == len(dilations)
    fold = 128 // c if c in (32, 64) else 1
    halos = tuple(_unit_halo(int(d), fold) for d in dilations)
    total = sum(halos)
    tile = tile or _pick_tile(t_len, c)
    # The stack reads 2*total halo rows per tile; below 4*total the
    # redundant-compute overhead outweighs the saved HBM round trips.
    if t_len < 2 * total or tile < 4 * total:
        from flamed_tts_tpu.models.facodec.encoder import residual_unit

        for p, d in zip(units, dilations):
            x = residual_unit(x, p, int(d))
        return x

    n_tiles = -(-t_len // tile)
    taps = _filters()
    operands = []
    for p in units:
        operands += list(_unit_operands(p, c, x.dtype, fold))

    if fold > 1:
        kern = partial(
            _stack_kernel_folded,
            tile_f=tile // fold, halos=halos, fold=fold,
            dilations=tuple(int(d) for d in dilations), taps=taps,
        )
    else:
        kern = partial(
            _stack_kernel, tile=tile, halos=halos,
            dilations=tuple(int(d) for d in dilations), taps=taps,
        )

    z = _tiled_call(x, kern, operands, tile=tile, halo=total, fold=fold,
                    n_tiles=n_tiles, c=c)

    # Edge patch: the exact XLA chain of all three units on 2*total-row
    # windows; valid interior rows are [total, t_len - total).
    w = 2 * total

    def xla_stack(seg):
        for p, d in zip(units, dilations):
            seg = _xla_unit(seg, p, int(d))
        return seg

    head = xla_stack(x[:, :w, :])[:, :total, :]
    tail = xla_stack(x[:, -w:, :])[:, -total:, :]
    return jnp.concatenate([head, z[:, total : t_len - total, :], tail], axis=1)
