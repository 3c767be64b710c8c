#!/usr/bin/env python3
"""One-shot TPU validation + timing of the fused residual-stack kernel.

Decides whether the fused 3-unit stack kernel (ops/pallas_resunit.py::
residual_stack_pallas) should replace the per-unit default on TPU
(flamed_tts_tpu/models/facodec/encoder.py::residual_stack, reference
block bodies facodec.py:121-133).  For every production (C, T) shape it

  1. computes an fp32-highest XLA reference (the only bitwise-stable
     anchor on TPU: both real candidates use MXU bf16 matmuls whose
     reduction orders differ, so comparing them to EACH OTHER at 1e-4
     just measures rounding-order noise — the round-4 checker's mistake),
  2. gates the fused kernel's error at <= max(3x default-path error,
     1e-4) relative,
  3. times both candidates with the fori_loop/dispatch-subtracted
     method (tools/bench_components.timeit_looped).

Exit 0 = parity OK; the printed per-shape ms decides the default flip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench_components import timeit_looped
    from flamed_tts_tpu.models.facodec.encoder import (
        residual_unit,
        residual_unit_xla,
    )
    from flamed_tts_tpu.ops.pallas_resunit import residual_stack_pallas

    rng = np.random.RandomState(7)

    def unit_params(c):
        return {
            "act1": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "act2": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv1": {"w": jnp.asarray(rng.randn(c, c, 7).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv2": {"w": jnp.asarray(rng.randn(c, c, 1).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
        }

    # decoder block bodies (C, T): 512@3840, 256@19200, 128@76800, 64@153600
    # encoder first block 32@153600
    shapes = [(512, 3840), (256, 19200), (128, 76800), (64, 153600),
              (32, 153600)]
    n_iters = int(os.environ.get("STACK_CHECK_ITERS", "20"))
    fail = False
    total_default = total_stack = 0.0
    for c, t in shapes:
        units = [unit_params(c) for _ in range(3)]
        x = jnp.asarray(rng.randn(1, t, c).astype(np.float32) * 0.5)

        def xla(v):
            for p, d in zip(units, (1, 3, 9)):
                v = residual_unit_xla(v, p, d)
            return v

        def default_path(v):
            for p, d in zip(units, (1, 3, 9)):
                v = residual_unit(v, p, int(d))
            return v

        def stack_path(v):
            return residual_stack_pallas(v, units, (1, 3, 9))

        with jax.default_matmul_precision("highest"):
            ref = np.asarray(jax.jit(xla)(x))
        scale = float(np.abs(ref).max())
        out_d = np.asarray(jax.jit(default_path)(x))
        out_s = np.asarray(jax.jit(stack_path)(x))
        err_d = float(np.abs(out_d - ref).max()) / max(scale, 1.0)
        err_s = float(np.abs(out_s - ref).max()) / max(scale, 1.0)
        gate = max(3.0 * err_d, 1e-4)
        ms_d = timeit_looped(default_path, x, reps=3, n=n_iters)
        ms_s = timeit_looped(stack_path, x, reps=3, n=n_iters)
        total_default += ms_d
        total_stack += ms_s
        verdict = "OK" if err_s <= gate else "FAIL"
        print(f"C={c:4d} T={t:6d}: rel-err default {err_d:.2e} stack "
              f"{err_s:.2e} (gate {gate:.2e}) | ms default {ms_d:.3f} "
              f"stack {ms_s:.3f} -> {verdict}", flush=True)
        fail |= err_s > gate
    print(f"TOTAL over block bodies: default {total_default:.2f} ms, "
          f"stack {total_stack:.2f} ms "
          f"({'stack wins' if total_stack < total_default else 'default wins'})")
    if fail:
        print("FAIL: stack kernel error above precision-aware gate")
        sys.exit(1)
    print("stack kernel TPU parity OK")


if __name__ == "__main__":
    main()
