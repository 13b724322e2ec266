"""Stage-level profiling: the TPU equivalent of the reference's Timer
(src/common_includes/elas/timer.{h,cpp} — named sections, grouped report)
plus hooks into jax.profiler for device traces.

Under the remote-TPU tunnel `block_until_ready` can return before device
completion (docs/KNOWN_ISSUES.md), so `sync()` forces a one-element host
fetch, which is the only reliable completion barrier.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Iterator, List, Optional

import numpy as np


def sync(x):
    """Reliably wait for a jax value (tree) to be computed."""
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "reshape"):
            np.asarray(leaf.reshape(-1)[:1])
    return x


class StageTimer:
    """Named-section wall-clock profiler (reference Timer semantics:
    start(name) closes the previous section; plot() prints a grouped
    report, timer.cpp:56-72)."""

    GROUPS = OrderedDict([
        ("Pre", ("Grayscale", "Descriptor", "Support Matches",
                 "Delaunay Triangulation", "Disparity Planes", "Grid")),
        ("Disparity", ("Matching",)),
        ("Post", ("L/R Consistency Check", "Remove Small Segments",
                  "Gap Interpolation", "Adaptive Mean", "Median",
                  "Reprojection")),
    ])

    def __init__(self):
        self.sections: "OrderedDict[str, float]" = OrderedDict()
        self._current: Optional[str] = None
        self._t0 = 0.0

    def start(self, name: str):
        now = time.perf_counter()
        if self._current is not None:
            self.sections[self._current] = (
                self.sections.get(self._current, 0.0) + now - self._t0)
        self._current = name
        self._t0 = now

    def stop(self):
        if self._current is not None:
            now = time.perf_counter()
            self.sections[self._current] = (
                self.sections.get(self._current, 0.0) + now - self._t0)
            self._current = None

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        self.start(name)
        try:
            yield
        finally:
            self.stop()

    def report(self) -> str:
        self.stop()
        lines = []
        total = sum(self.sections.values())
        grouped = {g: 0.0 for g in self.GROUPS}
        for name, t in self.sections.items():
            lines.append(f"  {name:<28s} {t * 1000:8.2f} ms")
            for g, members in self.GROUPS.items():
                if name in members:
                    grouped[g] += t
        for g, t in grouped.items():
            if t > 0:
                lines.append(f"  [{g:<26s}] {t * 1000:8.2f} ms")
        lines.append(f"  {'TOTAL':<28s} {total * 1000:8.2f} ms")
        return "\n".join(lines)

    def plot(self):
        print(self.report())


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context — produces a TensorBoard-compatible
    device trace of every kernel (TPU equivalent of `make profile=1`)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_pipeline(engine, left, right, n: int = 3) -> Dict[str, float]:
    """Per-stage timing of one ElasEngine frame, with forced sync after
    each stage.  Returns {section: seconds} (best of n)."""
    import jax.numpy as jnp
    from .engine import bgr_to_gray

    e = engine.elas
    best: Dict[str, float] = {}
    for _ in range(n):
        t = StageTimer()
        with t.section("Grayscale"):
            g1, g2 = bgr_to_gray(left), bgr_to_gray(right)
        with t.section("Descriptor+Support (device)"):
            out = sync(e._stage_support(jnp.asarray(g1), jnp.asarray(g2)))
        desc1, desc2, d_can = out
        with t.section("Host geometry"):
            g = e.host_mid(np.asarray(d_can))
        with t.section("Matching+Post (device)"):
            args = [jnp.asarray(g[k]) for k in
                    ("pts", "tris_l", "tris_r", "tri_l", "tri_r")]
            sync(e._stage_dense(desc1, desc2, *args))
        for k, v in t.sections.items():
            best[k] = min(best.get(k, 1e9), v)
    return best
