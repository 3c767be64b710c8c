#!/usr/bin/env python3
"""Headline benchmark: single-utterance RTF at nsteps-denoiser=64.

Prints ONE JSON line:
  {"metric": "rtf_single_utt_nfe64", "value": R, "unit": "rtf",
   "vs_baseline": 0.05 / R}

R = steady-state wall time / generated audio seconds for the full
pipeline (text -> prior -> denoiser -> codec decode -> host wav), the
exact quantity the reference CLI prints (reference synthesize.py:216-217).
The north-star target is RTF < 0.05 on one v5e chip (BASELINE.json), so
vs_baseline > 1 means the target is beaten.

Runs with random weights (the reference's pretrained checkpoints are not
published in this environment); the compute graph, shapes, and step
counts are identical to the trained path, so the timing is representative.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NSTEPS_DURGEN = 64
NSTEPS_DENOISER = 64
TARGET_RTF = 0.05
TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunny window sill in the early morning light."
)


def main() -> None:
    import jax

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    precision = os.environ.get("BENCH_PRECISION", "bf16")
    if precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.codec_wrapper import FaCodec
    from flamed_tts_tpu.models.flamed import Flamed

    cfg = load_default_config()
    model = Flamed(cfg, rng=jax.random.PRNGKey(0))
    codec = FaCodec.random_init(jax.random.PRNGKey(1))
    if precision == "bf16":
        model.cast_inference_params()
        codec.cast_inference_params()

    # 3 s prompt at 16 kHz
    t_axis = np.arange(3 * 16000) / 16000.0
    prompt = (0.1 * np.sin(2 * np.pi * 220 * t_axis)).astype(np.float32)

    # A trained duration model yields ~5-7 frames/phoneme (80 fps); random
    # weights yield ~1, which would shrink the denominator and overstate
    # RTF.  Bias the duration flow's output layer so the sampled
    # durations land at ~6-7 frames/phoneme (and silences at ~0): the
    # bench then drives the EXACT production path (model.sample: frontend
    # -> prompt analysis -> fused prior+denoiser+codec call) end to end.
    import math

    dg = model.params["prior"]["params"]["duration_generator"]["linear_layer"]
    dg["kernel"] = jnp.zeros_like(dg["kernel"])
    dg["bias"] = jnp.full_like(dg["bias"], math.log(7.0))
    sg = model.params["prior"]["params"]["sil_generator"]["linear_layer"]
    sg["kernel"] = jnp.zeros_like(sg["kernel"])
    sg["bias"] = jnp.full_like(sg["bias"], -1.0)

    def run(seed: int):
        return model.sample(
            text=TEXT,
            prompt_raw=prompt,
            codec=codec,
            nsteps_durgen=NSTEPS_DURGEN,
            nsteps_denoiser=NSTEPS_DENOISER,
            temp_durgen=0.3,
            temp_denoiser=0.3,
            rng=jax.random.PRNGKey(seed),
        )

    # Warm until the speculative frame bucket stabilizes: the first run
    # seeds the frames/phoneme history, which can shift the fused
    # program's bucket (a fresh ~40 s compile) on the SECOND call — so a
    # single warmup run would leave compiles inside the timed section.
    for seed in range(3):
        run(seed)

    # Contention guards (docs/PERFORMANCE.md: a concurrent compile on
    # this 1-core host inflates timed sections several-fold — round 2's
    # official number was contaminated exactly this way).
    # (a) host load average;
    # (b) dispatch-floor probe: a trivial device round trip costs ~25 ms
    #     through the tunnel; a busy host stretches it.
    def dispatch_floor_ms() -> float:
        x = jnp.float32(1.0)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jax.device_get(x + 1))
            samples.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(samples))

    load1 = os.getloadavg()[0]
    floor_ms = dispatch_floor_ms()
    contended = load1 > 1.5 or floor_ms > 60.0
    if contended:
        print(
            f"[bench] WARNING: host looks busy (load1={load1:.2f}, "
            f"dispatch probe {floor_ms:.0f} ms vs ~25 ms floor); timings "
            "will be inflated — rerun on an idle host",
            file=sys.stderr,
        )

    times, seconds = [], []
    for seed in range(1, 6):
        t0 = time.time()
        out = run(seed)
        times.append(time.time() - t0)
        seconds.append(len(out["wav"]) / 16000.0)

    # Robust aggregate: drop runs blown up by transient host activity
    # (> 1.3x the fastest), average the rest.  On an idle host this is a
    # no-op; on a dirty host it recovers the uncontended figure and the
    # warning above flags the run as suspect anyway.
    t_min = min(times)
    kept = [t for t in times if t <= 1.3 * t_min]
    dropped = len(times) - len(kept)
    if dropped:
        print(
            f"[bench] dropped {dropped}/{len(times)} outlier runs "
            f"(min {t_min:.3f}s, all: {[round(t, 3) for t in times]})",
            file=sys.stderr,
        )
    audio_seconds = float(np.mean(seconds))
    print(
        f"[bench] audio={audio_seconds:.2f}s per-run={np.mean(kept):.3f}s "
        f"(precision={precision}, load1={load1:.2f}, probe={floor_ms:.0f}ms)",
        file=sys.stderr,
    )
    rtf = float(np.mean(kept) / audio_seconds)
    print(
        json.dumps(
            {
                "metric": "rtf_single_utt_nfe64",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
