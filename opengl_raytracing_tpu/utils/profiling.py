"""Profiling & metrics: frame timers, ray counters, and jax.profiler hooks.

The reference's only instrumentation is the ImGui FPS meter
(reference: src/ui/gui.cpp:206-207); here we provide what a production
renderer needs: per-pass wall-clock, Mrays/s accounting, and XLA traces.

NOTE (TPU/axon): `block_until_ready` is unreliable on the tunneled
platform — `FrameTimer` forces completion through a scalar readback.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .log import log


def force_complete(tree) -> float:
    """Force device completion via a scalar readback; returns the scalar."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    # sum EVERY leaf: reading back only one would leave later independent
    # dispatches async on the tunneled platform and under-time sections
    s = sum(jnp.sum(jnp.asarray(x, jnp.float32)) for x in leaves)
    return float(s)


class FrameTimer:
    """Rolling per-pass wall-clock stats (forced completion)."""

    def __init__(self, window: int = 120):
        self.window = window
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str, result_ref: Optional[list] = None):
        t0 = time.monotonic()
        yield
        if result_ref:
            force_complete(result_ref[0])
        dt = (time.monotonic() - t0) * 1e3
        buf = self.samples.setdefault(name, [])
        buf.append(dt)
        if len(buf) > self.window:
            buf.pop(0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, buf in self.samples.items():
            a = np.asarray(buf)
            out[name] = {"mean_ms": float(a.mean()),
                         "p50_ms": float(np.percentile(a, 50)),
                         "p95_ms": float(np.percentile(a, 95)),
                         "n": len(buf)}
        return out

    def report(self) -> None:
        for name, s in self.stats().items():
            log("BENCH", "%s: %.2f ms (p95 %.2f, n=%d)", name, s["mean_ms"],
                s["p95_ms"], s["n"])


class RayCounter:
    """Ray accounting per frame: primary / shadow / gi / ao rays.

    Counts are analytic (derived from resolution + preset), matching how
    the reference's report derives throughput (pixels x FPS, SURVEY.md §6).
    """

    def __init__(self, height: int, width: int):
        self.pixels = height * width

    def rays_per_frame(self, params, use_bvh: bool = False) -> Dict[str, int]:
        spp = max(int(params.spp_per_frame), 1)
        px = self.pixels
        shadow_per_hit = 4  # disk samples
        shadow_per_hit += 1 if params.sun_enabled else 0
        shadow_per_hit += 1 if params.point_light_enabled else 0
        out = {"primary": px,
               "shadow": px * spp * shadow_per_hit}
        if params.enable_gi:
            # one bounce + direct light at the secondary hit
            out["gi"] = px * spp * (1 + shadow_per_hit)
        if params.enable_ao:
            out["ao"] = px * spp * int(params.ao_samples)
        out["total"] = sum(out.values())
        return out

    def mrays(self, params, frame_ms: float, use_bvh: bool = False,
              kind: str = "total") -> float:
        rays = self.rays_per_frame(params, use_bvh)[kind]
        return rays / (frame_ms * 1e-3) / 1e6


@contextlib.contextmanager
def xla_trace(outdir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log("BENCH", "XLA trace written to %s", outdir)
