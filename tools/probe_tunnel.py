#!/usr/bin/env python3
"""Measure the TPU tunnel's dispatch floor and per-byte transfer cost.

The axon device link costs ~25-35 ms per dispatch AND per host read
(memory/tpu-env-quirks.md); on top of that, array bytes move at a
finite rate each way.  This probe separates the three so per-call
overhead in bench.py / profile_sample.py can be attributed:

    per_run ~= dispatch_floor + upload_bytes/up_bw + download_bytes/dn_bw
               + device_compute + host_python

Method: time (upload N bytes -> trivial reduce -> scalar read) minus the
scalar-only floor; downloads use an on-device broadcast so upload stays
one scalar.  Run on an IDLE host; concurrent work inflates everything.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum())
    s = np.float32(1.0)
    for _ in range(3):
        float(jax.device_get(f(jnp.asarray(s))))
    n = 10
    t0 = time.time()
    for _ in range(n):
        float(jax.device_get(f(jnp.asarray(s))))
    floor = (time.time() - t0) / n
    out = {"dispatch_floor_ms": round(floor * 1e3, 2), "upload": {}, "download": {}}

    for kb in (128, 256, 512, 1024):
        a = np.random.randn(kb * 256).astype(np.float32)
        for _ in range(2):
            float(jax.device_get(f(jnp.asarray(a))))
        t0 = time.time()
        for _ in range(n):
            float(jax.device_get(f(jnp.asarray(a))))
        per = (time.time() - t0) / n
        out["upload"][f"{kb}KB"] = {
            "ms": round(per * 1e3, 1),
            "MBps": round(kb / 1024 / max(per - floor, 1e-9), 1),
        }

    for kb in (128, 256, 512, 1024):
        h = jax.jit(lambda x, m=kb * 256: jnp.broadcast_to(x, (m,)))
        for _ in range(2):
            np.asarray(jax.device_get(h(jnp.float32(1.0))))
        t0 = time.time()
        for _ in range(n):
            np.asarray(jax.device_get(h(jnp.float32(1.0))))
        per = (time.time() - t0) / n
        out["download"][f"{kb}KB"] = {
            "ms": round(per * 1e3, 1),
            "MBps": round(kb / 1024 / max(per - floor, 1e-9), 1),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
