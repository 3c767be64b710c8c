#!/usr/bin/env python3
"""Component microbenchmarks on the real TPU.

Methodology: the tunnel costs ~25 ms per device call, which drowns any
single-op timing.  Every op here is timed as N iterations of a
``lax.fori_loop`` INSIDE one jitted program (the input is perturbed by
the loop carry so XLA cannot hoist or CSE the body), and the wall time
is divided by N.  The ~25 ms dispatch is amortized to noise.

Usage:
  python tools/bench_components.py [--which codec,pieces,prior,convforms,mfu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_ITERS = 50


_DISPATCH_MS = None


def _dispatch_floor_ms() -> float:
    """Measured wall cost of one trivial device call (the ~25 ms tunnel)."""
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        import jax
        import jax.numpy as jnp

        trivial = jax.jit(lambda s: s + 1.0)
        float(jax.device_get(trivial(jnp.float32(0.0))))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(jax.device_get(trivial(jnp.float32(0.0))))
            ts.append((time.perf_counter() - t0) * 1e3)
        _DISPATCH_MS = float(np.median(ts))
        print(f"[dispatch floor: {_DISPATCH_MS:.1f} ms/call — subtracted]")
    return _DISPATCH_MS


def timeit_looped(op, x, reps: int = 5, n: int = N_ITERS) -> float:
    """Median ms per op call; op(x_perturbed) must return an array/pytree.

    Other operands (weights) are closed over — loop-invariant, exactly as
    in the real model.  Completion is forced with a host read of the
    scalar carry (``block_until_ready`` returns early on the axon
    platform), and the per-call dispatch floor is subtracted.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(x):
        def body(i, acc):
            y = op(x + acc.astype(x.dtype))
            leaves = jax.tree.leaves(y)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    floor = _dispatch_floor_ms()
    float(jax.device_get(prog(x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(prog(x)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return max((float(np.median(ts)) - floor) / n, 0.0)


def bench_codec(dtype) -> None:
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.models.facodec.decoder import (
        decoder_block,
        init_decoder_params,
        synthesize,
    )
    from flamed_tts_tpu.ops.conv1d import conv1d

    params = init_decoder_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params
    )
    T = 768
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, T, 256), dtype)
    timbre = jax.random.normal(jax.random.PRNGKey(2), (1, 256), dtype)

    ms = timeit_looped(lambda x: synthesize(params, x, timbre), lat, n=10)
    print(f"codec synthesize total: {ms:8.2f} ms")

    ms = timeit_looped(
        lambda x: conv1d(x, params["stem"]["w"], params["stem"]["b"], padding=3), lat
    )
    print(f"  stem conv 256->1024 @ {T}: {ms:8.3f} ms")

    x = jax.jit(
        lambda x: conv1d(x, params["stem"]["w"], params["stem"]["b"], padding=3)
    )(lat)
    for i, stride in enumerate((5, 5, 4, 2)):
        ms = timeit_looped(
            lambda v, i=i, s=stride: decoder_block(v, params["blocks"][i], s), x, n=20
        )
        print(
            f"  block{i} C{x.shape[2]}->{x.shape[2] // 2} L{x.shape[1]} "
            f"stride{stride}: {ms:8.3f} ms"
        )
        x = jax.jit(
            lambda v, i=i, s=stride: decoder_block(v, params["blocks"][i], s)
        )(x)


def bench_codec_pieces(dtype) -> None:
    """Inside one decoder block: snake vs conv-transpose vs res units."""
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.models.facodec.decoder import init_decoder_params
    from flamed_tts_tpu.models.facodec.encoder import residual_unit
    from flamed_tts_tpu.ops.conv1d import conv_transpose1d
    from flamed_tts_tpu.ops.resample import snake_filtered

    params = init_decoder_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params
    )
    shapes = [(768, 1024, 512, 5), (3840, 512, 256, 5), (19200, 256, 128, 4), (76800, 128, 64, 2)]
    for i, (L, ci, co, s) in enumerate(shapes):
        p = params["blocks"][i]
        x = jax.random.normal(jax.random.PRNGKey(i), (1, L, ci), dtype)
        t_snk = timeit_looped(
            lambda v, p=p: snake_filtered(v, p["act"]["alpha"], p["act"]["beta"]), x
        )
        up = lambda v, p=p, s=s: conv_transpose1d(
            v, p["up"]["w"], p["up"]["b"], stride=s,
            padding=s // 2 + s % 2, output_padding=s % 2,
        )
        t_up = timeit_looped(up, x)
        y = jax.jit(up)(x)
        t_res = timeit_looped(
            lambda v, p=p: residual_unit(
                residual_unit(residual_unit(v, p["res"][0], 1), p["res"][1], 3),
                p["res"][2], 9,
            ),
            y, n=20,
        )
        print(
            f"  block{i} L{L} C{ci}: snake {t_snk:7.3f}  "
            f"convT {t_up:7.3f}  res x3 {t_res:7.3f} ms"
        )


def bench_prior(dtype) -> None:
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator

    cfg = load_default_config()
    model = PriorGenerator(config=cfg["prior_generator"])
    rng = jax.random.PRNGKey(0)
    B, P, L = 1, 256, 768
    phonemes = jnp.ones((B, 64), jnp.int32)
    src_mask = jnp.zeros((B, 64), bool)
    variables = model.init(
        rng,
        phonemes,
        src_mask,
        jnp.zeros((B, 8, 192)),
        jnp.zeros((B, 8), bool),
        jnp.zeros((B, 6, 4), jnp.int32),
        jnp.full((B,), 4, jnp.int32),
        method="init_all",
    )
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
    )

    lr_out = jax.random.normal(rng, (B, L, 192), dtype)
    tgt_mask = jnp.zeros((B, L), bool)
    prompts = jnp.ones((B, 6, P), jnp.int32)
    p_lens = jnp.full((B,), P, jnp.int32)

    ms = timeit_looped(
        lambda v: model.apply(params, v, tgt_mask, prompts, p_lens, method="decode"),
        lr_out, n=10,
    )
    print(f"prior decode (shared+6 dec, {P}+{L}): {ms:8.2f} ms")


def bench_convforms(dtype) -> None:
    """conv_transpose lhs_dilation vs polyphase-matmul; conv1d vs im2col."""
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.ops.conv1d import conv1d, conv_transpose1d

    print("conv_transpose: lhs_dilation vs polyphase matmul")
    for (L, ci, co, s) in [(768, 1024, 512, 5), (3840, 512, 256, 5), (19200, 256, 128, 4), (76800, 128, 64, 2)]:
        k = 2 * s
        w = jax.random.normal(jax.random.PRNGKey(0), (ci, co, k), dtype) * 0.02
        b = jnp.zeros((co,), dtype)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, L, ci), dtype)
        pad = s // 2 + s % 2

        t_ref = timeit_looped(
            lambda v: conv_transpose1d(
                v, w, b, stride=s, padding=pad, output_padding=s % 2
            ),
            x,
        )

        wn = np.asarray(w, np.float32)
        taps = []
        for r in range(s):
            row = np.zeros((3, ci, co), np.float32)
            for p_, j in enumerate((-1, 0, 1)):
                tap = j * s + r + pad
                if 0 <= tap < k:
                    row[p_] = wn[:, :, tap]
            taps.append(row)
        wt = jnp.asarray(np.stack(taps, axis=0), dtype)  # (s, 3, ci, co)

        def poly(v, wt=wt, b=b, s=s, ci=ci, co=co):
            B, L_, _ = v.shape
            zero = jnp.zeros((B, 1, ci), v.dtype)
            xnext = jnp.concatenate([v[:, 1:], zero], axis=1)
            xprev = jnp.concatenate([zero, v[:, :-1]], axis=1)
            xx = jnp.stack([xnext, v, xprev], axis=2)  # (B, L, 3, ci)
            y = jnp.einsum("blpc,rpcd->blrd", xx, wt)
            return y.reshape(B, L_ * s, co) + b

        t_poly = timeit_looped(poly, x)
        err = float(
            jnp.max(
                jnp.abs(
                    jax.jit(poly)(x).astype(jnp.float32)
                    - jax.jit(
                        lambda v: conv_transpose1d(
                            v, w, b, stride=s, padding=pad, output_padding=s % 2
                        )
                    )(x).astype(jnp.float32)
                )
            )
        )
        print(
            f"  convT L{L} {ci}->{co} s{s}: lhs_dil {t_ref:7.3f}  "
            f"poly {t_poly:7.3f} ms  (maxerr {err:.2e})"
        )

    print("conv1d k7: conv_general vs im2col matmul")
    for (L, ci, co, dil) in [(768, 256, 1024, 1), (3840, 512, 512, 1), (3840, 512, 512, 9), (19200, 256, 256, 1), (76800, 64, 64, 1)]:
        k = 7
        w = jax.random.normal(jax.random.PRNGKey(0), (co, ci, k), dtype) * 0.02
        b = jnp.zeros((co,), dtype)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, L, ci), dtype)
        padc = ((k - 1) * dil) // 2

        t_ref = timeit_looped(
            lambda v: conv1d(v, w, b, padding=padc, dilation=dil), x
        )

        wm = jnp.transpose(w, (2, 1, 0)).reshape(k * ci, co)  # (k*ci, co)

        def im2col(v, wm=wm, b=b, k=k, dil=dil, padc=padc):
            B, L_, _ = v.shape
            vp = jnp.pad(v, ((0, 0), (padc, padc), (0, 0)))
            cols = jnp.concatenate(
                [vp[:, i * dil : i * dil + L_] for i in range(k)], axis=-1
            )  # (B, L, k*ci)
            return cols @ wm + b

        t_i2c = timeit_looped(im2col, x)
        err = float(
            jnp.max(
                jnp.abs(
                    jax.jit(im2col)(x).astype(jnp.float32)
                    - jax.jit(lambda v: conv1d(v, w, b, padding=padc, dilation=dil))(
                        x
                    ).astype(jnp.float32)
                )
            )
        )
        print(
            f"  conv1d L{L} {ci}->{co} d{dil}: conv {t_ref:7.3f}  "
            f"im2col {t_i2c:7.3f} ms  (maxerr {err:.2e})"
        )


V5E_PEAK_BF16_TFLOPS = 197.0   # one v5e chip, bf16 MXU peak
V5E_PEAK_HBM_GBS = 819.0       # one v5e chip, HBM bandwidth


def _cost(fn, *args):
    """XLA's own (flops, bytes-accessed) estimate for jit(fn)(*args).

    Note: XLA cost analysis counts a while/scan body ONCE, so loops must
    be analyzed per-step and scaled by the trip count by the caller.
    """
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _mfu_row(name, ms, flops, nbytes):
    tflops = flops / (ms * 1e-3) / 1e12 if ms > 0 else 0.0
    gbs = nbytes / (ms * 1e-3) / 1e9 if ms > 0 else 0.0
    print(
        f"  {name:<38} {ms:8.3f} ms  {flops / 1e9:9.2f} GF "
        f"{tflops:7.2f} TF/s ({100 * tflops / V5E_PEAK_BF16_TFLOPS:5.1f}% MXU)  "
        f"{gbs:7.1f} GB/s ({100 * gbs / V5E_PEAK_HBM_GBS:5.1f}% HBM)"
    )
    return {"name": name, "ms": ms, "gflop": flops / 1e9,
            "tflops": tflops, "mxu_pct": 100 * tflops / V5E_PEAK_BF16_TFLOPS,
            "gbs": gbs, "hbm_pct": 100 * gbs / V5E_PEAK_HBM_GBS}


def bench_mfu(dtype, batch: int = 1, nfe: int = 64) -> None:
    """FLOP-utilization accounting for the four pipeline stages.

    ms comes from the fori_loop method (dispatch floor subtracted);
    flops/bytes from XLA cost analysis of the same program (per-step for
    the Euler scan, scaled by nfe).  Peaks: one v5e chip, bf16.
    """
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.facodec.decoder import init_decoder_params, synthesize
    from flamed_tts_tpu.models.facodec.encoder import encoder_forward, init_encoder_params
    from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
    from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator

    cfg = load_default_config()
    B, P, L, NFE = batch, 256, 768, nfe
    cast = lambda tree: jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )
    rows = []
    print(f"MFU accounting (B={B}, frames={L}, nfe={NFE}, {dtype.__name__}; "
          f"peaks: {V5E_PEAK_BF16_TFLOPS:.0f} TF/s bf16 MXU, "
          f"{V5E_PEAK_HBM_GBS:.0f} GB/s HBM)")

    # --- denoiser: one Euler step x NFE -------------------------------
    prob = ProbGenerator(config=cfg["prob_generator"])
    rng = jax.random.PRNGKey(0)
    pp = prob.init(
        rng,
        jnp.zeros((B, 6, L, cfg["prob_generator"]["cond_dim"])),
        jnp.zeros((B, cfg["prob_generator"]["spk_dim"])),
        jnp.zeros((B, L), bool),
    )
    pp = cast(pp)
    ts = jnp.linspace(0.0, 1.0, NFE + 1, dtype=jnp.float32)[:-1]
    spk = jax.random.normal(rng, (B, cfg["prob_generator"]["spk_dim"]), dtype)
    mods_all = jax.jit(
        lambda t, s: prob.apply(pp, t, s, method="denoiser_mods")
    )(ts, spk)
    mods_1 = jax.tree.map(lambda a: a[0], mods_all)
    pad = jnp.zeros((B, L), bool)
    x = jax.random.normal(rng, (B, L, cfg["prob_generator"]["target_dim"]), dtype)

    def one_step(v):
        return prob.apply(pp, v, mods_1, pad, method="denoise_with_mods")

    ms = timeit_looped(one_step, x)
    fl, by = _cost(one_step, x)
    rows.append(_mfu_row(f"denoiser step x{NFE} (extrapolated)",
                         ms * NFE, fl * NFE, by * NFE))

    # --- prior decode -------------------------------------------------
    prior = PriorGenerator(config=cfg["prior_generator"])
    var = prior.init(
        rng,
        jnp.ones((B, 64), jnp.int32), jnp.zeros((B, 64), bool),
        jnp.zeros((B, 8, 192)), jnp.zeros((B, 8), bool),
        jnp.zeros((B, 6, 4), jnp.int32), jnp.full((B,), 4, jnp.int32),
        method="init_all",
    )
    var = cast(var)
    lr_out = jax.random.normal(rng, (B, L, 192), dtype)
    tgt_mask = jnp.zeros((B, L), bool)
    prompts = jnp.ones((B, 6, P), jnp.int32)
    p_lens = jnp.full((B,), P, jnp.int32)

    def prior_dec(v):
        return prior.apply(var, v, tgt_mask, prompts, p_lens, method="decode")

    ms = timeit_looped(prior_dec, lr_out, n=10)
    fl, by = _cost(prior_dec, lr_out)
    rows.append(_mfu_row(f"prior decode (shared+6 dec, {P}+{L})", ms, fl, by))

    # --- codec decode -------------------------------------------------
    dp = cast(init_decoder_params(jax.random.PRNGKey(0)))
    lat = jax.random.normal(rng, (B, L, 256), dtype)
    timbre = jax.random.normal(rng, (B, 256), dtype)

    def codec_dec(v):
        return synthesize(dp, v, timbre)

    ms = timeit_looped(codec_dec, lat, n=10)
    fl, by = _cost(codec_dec, lat)
    rows.append(_mfu_row(f"codec decode ({L}f -> {L * 200 / 16000:.1f}s wav)", ms, fl, by))

    # --- prompt encode (3 s) ------------------------------------------
    ep = cast(init_encoder_params(jax.random.PRNGKey(0)))
    wav = jax.random.normal(rng, (B, 48000, 1), dtype)

    def enc(v):
        return encoder_forward(ep, v)

    ms = timeit_looped(enc, wav, n=10)
    fl, by = _cost(enc, wav)
    rows.append(_mfu_row("prompt encode (3 s wav)", ms, fl, by))

    # --- previously-untabulated stages (round-3 verdict item 5): the
    # ~60 ms-over-floor gap blamed "PVA/LR/FVQ/host work"; measure each.

    # phoneme encoder (6 FFT blocks over the source length)
    Lsrc = 64
    phon = jnp.ones((B, Lsrc), jnp.int32)
    src_mask = jnp.zeros((B, Lsrc), bool)

    def phone_enc(v):
        return prior.apply(var, v, src_mask, method="encode")

    ms = timeit_looped(phone_enc, phon, n=10)
    fl, by = _cost(phone_enc, phon)
    rows.append(_mfu_row(f"phoneme encode (L={Lsrc})", ms, fl, by))

    # PVA duration+silence flow, full nfe-step scan.  XLA cost analysis
    # counts a scan body once, so scale flops/bytes by NFE (the pre/post
    # work outside the scan is negligible next to the body).
    from flamed_tts_tpu.models.prior.sampling import pva_sample

    enc_out = jax.random.normal(rng, (B, Lsrc, 192), dtype)

    def pva_full(v):
        return pva_sample(
            prior, var, v, src_mask, jax.random.PRNGKey(1), NFE, 0.3
        )

    ms = timeit_looped(pva_full, enc_out, n=10)
    fl, by = _cost(pva_full, enc_out)
    rows.append(_mfu_row(f"PVA dur+sil flow x{NFE} (scan)", ms, fl * NFE, by * NFE))

    # length regulator (gather expansion to the frame bucket)
    from flamed_tts_tpu.ops.length_regulator import length_regulate

    pd = jnp.full((B, Lsrc), 7.0, dtype=jnp.float32)
    sd = jnp.full((B, Lsrc), 1.0, dtype=jnp.float32)
    lens = jnp.full((B,), Lsrc, jnp.int32)

    def lr(v):
        return length_regulate(v, pd, sd, lens, L)[0]

    ms = timeit_looped(lr, enc_out, n=10)
    fl, by = _cost(lr, enc_out)
    rows.append(_mfu_row(f"length regulator ({Lsrc} -> {L})", ms, fl, by))

    # codec analyze on the 3 s prompt: 3 RVQ groups + timbre transformer
    from flamed_tts_tpu.models.facodec.decoder import analyze

    Lp = 240
    plat = jax.random.normal(rng, (B, Lp, 256), dtype)
    pmask = jnp.zeros((B, Lp), bool)

    def codec_an(v):
        return analyze(dp, v, pmask)

    ms = timeit_looped(codec_an, plat, n=10)
    fl, by = _cost(codec_an, plat)
    rows.append(_mfu_row(f"codec analyze (RVQ+timbre, {Lp}f)", ms, fl, by))

    # denoiser condition path: quantizer encoding + downsampler (once)
    hid = jax.random.normal(rng, (B, 6, L, cfg["prob_generator"]["cond_dim"]), dtype)

    def cond(v):
        return prob.apply(pp, v, pad, method="encode_condition")

    ms = timeit_looped(cond, hid, n=10)
    fl, by = _cost(cond, hid)
    rows.append(_mfu_row("denoiser condition path (once)", ms, fl, by))

    # adaLN modulation precompute for all NFE steps (once)
    def mods(t_all):
        return prob.apply(pp, t_all, spk, method="denoiser_mods")

    ms = timeit_looped(mods, ts, n=10)
    fl, by = _cost(mods, ts)
    rows.append(_mfu_row(f"adaLN mods precompute ({NFE} steps, once)", ms, fl, by))

    total_ms = sum(r["ms"] for r in rows)
    total_fl = sum(r["gflop"] for r in rows)
    audio_s = B * L * 200 / 16000  # batch generates B utterances at once
    print(f"  total compute {total_ms:.1f} ms / {audio_s:.1f} s audio "
          f"= RTF {total_ms / 1e3 / audio_s:.4f} compute floor; "
          f"{total_fl:.1f} GFLOP")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="codec,pieces,prior,convforms")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--batch", type=int, default=1,
                    help="Batch size for --which mfu (throughput-mode table).")
    ap.add_argument("--nfe", type=int, default=64,
                    help="Euler steps for --which mfu.")
    args = ap.parse_args()

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    which = set(args.which.split(","))
    if "codec" in which:
        bench_codec(dtype)
    if "pieces" in which:
        bench_codec_pieces(dtype)
    if "prior" in which:
        bench_prior(dtype)
    if "convforms" in which:
        bench_convforms(dtype)
    if "mfu" in which:
        bench_mfu(dtype, batch=args.batch, nfe=args.nfe)


if __name__ == "__main__":
    main()
