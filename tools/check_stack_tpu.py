#!/usr/bin/env python3
"""One-shot TPU validation of the fused residual-stack kernel.

Runs the decoder/encoder block bodies (3 residual units) both ways on
the REAL device — residual_stack_pallas vs the XLA chain — at
production shapes, prints max|diff| per shape, and exits non-zero above
tolerance.  Complements the CPU interpret-mode tests
(tests/test_pallas_kernels.py) with actual-Mosaic coverage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla
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
    shapes = [(512, 3840), (256, 19200), (128, 76800), (64, 153600), (32, 153600)]
    worst = 0.0
    for c, t in shapes:
        units = [unit_params(c) for _ in range(3)]
        x = jnp.asarray(rng.randn(1, t, c).astype(np.float32) * 0.5)

        def xla(v):
            for p, d in zip(units, (1, 3, 9)):
                v = residual_unit_xla(v, p, d)
            return v

        ref = np.asarray(jax.jit(xla)(x))
        out = np.asarray(jax.jit(
            lambda v: residual_stack_pallas(v, units, (1, 3, 9))
        )(x))
        diff = float(np.abs(out - ref).max())
        scale = float(np.abs(ref).max())
        print(f"C={c:4d} T={t:6d}: max|diff| {diff:.3e} (ref max {scale:.2f})",
              flush=True)
        worst = max(worst, diff / max(scale, 1.0))
    if worst > 1e-4:
        print(f"FAIL: relative diff {worst:.3e} > 1e-4")
        sys.exit(1)
    print("stack kernel TPU parity OK")


if __name__ == "__main__":
    main()
