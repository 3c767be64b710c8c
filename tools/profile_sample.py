#!/usr/bin/env python3
"""Host-span breakdown of one `model.sample` run on the real TPU.

The round-4 MFU table (docs/PERFORMANCE.md) pins total device compute at
~42 ms, yet end-to-end wall is ~113 ms.  This tool attributes the gap:
it installs a StageTimer into the sampling hot path
(utils/profiling.py::SAMPLE_TIMER) and reports, per steady-state run,

  frontend       text -> phoneme ids (pure host)
  prompt_prep    wav padding to the codec grid (pure host)
  input_place    jnp.asarray / device_put of the small inputs
  prompt_place   device_put of the prompt waveform
  fused_dispatch the jitted call returning its handles (tunnel enqueue)
  fused_get      jax.device_get of (lens, mask, wav) — blocks on compute
  residual       total wall minus all of the above (host glue)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_sample.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunny window sill in the early morning light."
)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.codec_wrapper import FaCodec
    from flamed_tts_tpu.models.flamed import Flamed
    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache
    from flamed_tts_tpu.utils import profiling

    enable_persistent_cache()
    cfg = load_default_config()
    model = Flamed(cfg, rng=jax.random.PRNGKey(0))
    codec = FaCodec.random_init(jax.random.PRNGKey(0))
    model.cast_inference_params()
    codec.cast_inference_params()

    t_axis = np.arange(3 * 16000) / 16000.0
    prompt = (0.1 * np.sin(2 * np.pi * 220 * t_axis)).astype(np.float32)

    # Same duration bias as bench.py: drive trained-like lengths.
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
            nsteps_durgen=64,
            nsteps_denoiser=64,
            temp_durgen=0.3,
            temp_denoiser=0.3,
            rng=jax.random.PRNGKey(seed),
        )

    for seed in range(3):  # warm: compile + bucket history
        run(seed)

    timer = profiling.StageTimer()
    profiling.SAMPLE_TIMER = timer
    n_runs, walls, secs = 5, [], []
    for seed in range(1, 1 + n_runs):
        t0 = time.perf_counter()
        out = run(seed)
        walls.append(time.perf_counter() - t0)
        secs.append(len(out["wav"]) / 16000.0)
    profiling.SAMPLE_TIMER = None

    spans = timer.summary()  # mean seconds per span
    wall = float(np.mean(walls))
    accounted = sum(spans.values())
    report = {
        "wall_ms": round(wall * 1e3, 2),
        "audio_s": round(float(np.mean(secs)), 2),
        "rtf": round(wall / float(np.mean(secs)), 5),
        "spans_ms": {k: round(v * 1e3, 2) for k, v in sorted(spans.items())},
        "residual_ms": round((wall - accounted) * 1e3, 2),
        "all_walls_ms": [round(w * 1e3, 1) for w in walls],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
