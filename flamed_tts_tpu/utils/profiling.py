"""Profiling utilities (new functionality — the reference has none,
SURVEY §5: only wall-clock RTF spans).

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
* ``StageTimer`` — lightweight named wall-clock spans with a summary,
  for host-side breakdowns (stage1 / stage2 / codec / io).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


# Opt-in host-span profiling of the sampling hot path: a profiling tool
# (tools/profile_sample.py) installs a StageTimer here; when None the
# spans below compile to a nullcontext and cost nothing measurable.
SAMPLE_TIMER = None


def sample_span(name: str):
    t = SAMPLE_TIMER
    return t.span(name) if t is not None else contextlib.nullcontext()


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: round(self.totals[name] / max(self.counts[name], 1), 4)
            for name in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v * 1000:.1f}ms" for k, v in sorted(self.summary().items())
        )
