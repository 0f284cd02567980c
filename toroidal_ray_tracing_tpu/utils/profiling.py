"""Tracing / profiling utilities.

The reference's instrumentation is an ImGui FPS readout, the LUNARG monitor
layer, and a commented-out per-power-state FPS logger
(VKT/ray_tracing__before/main.cpp:287,162,88-110; SURVEY.md §5). Here:

* `FrameTimer` — wall-clock per-frame stats + Mrays/s derived from the
  renderer's traceRayEXT-equivalent counters (the `io.Framerate` analog).
* `trace_to(dir)` — context manager around `jax.profiler` for full XLA/TPU
  traces viewable in TensorBoard/Perfetto (the NSight-capture analog;
  the reference names objects for NSight at hello_vulkan.cpp:225-228,890).
"""

from __future__ import annotations

import contextlib
import os
import time


class FrameTimer:
    """Accumulates frame wall times and ray counts.

    >>> ft = FrameTimer()
    >>> with ft.frame():
    ...     out = render(...)
    ...     out["image"].block_until_ready()
    ...     ft.add_rays(out["rays_traced"])
    >>> ft.summary()
    """

    def __init__(self):
        self.times: list = []
        self.rays: list = []

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def add_rays(self, n):
        self.rays.append(float(n))

    def summary(self, skip_first: bool = True) -> dict:
        """skip_first drops the compile frame."""
        ts = self.times[1:] if skip_first and len(self.times) > 1 else self.times
        rs = self.rays[1:] if skip_first and len(self.rays) > 1 else self.rays
        if not ts:
            return {}
        total = sum(ts)
        out = {
            "frames": len(ts),
            "mean_ms": 1000.0 * total / len(ts),
            "fps": len(ts) / total,
        }
        if rs and total > 0:
            out["mrays_per_s"] = sum(rs) / total / 1e6
        return out


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache for the benchmark/experiment CLIs.

    Remote Mosaic compiles over the TPU tunnel take 2-6 minutes per new
    kernel shape; the JAX persistent cache replays serialized executables
    across processes when the backend supports it (silently a no-op when it
    doesn't). Tests configure their own cache dir (tests/conftest.py) —
    this helper is for bench.py / experiments CLIs only, so interactive
    render() users keep JAX defaults."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_tpu_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
