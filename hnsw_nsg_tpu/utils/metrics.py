"""Timers, counters and profiler hooks.

The reference's observability is homemade (SURVEY.md §5.1): a microsecond
``StopW`` stopwatch (hnswlib/tests/cpp/sift_1m.cpp:13-30), RSS probes
(hnsw_nsg/tests/test_hnsw_nsg_search.cpp:70-144), and atomic
``metric_hops`` / ``metric_distance_computations`` counters
(hnswalg.h:65-66). Equivalents here: ``StopW`` (host wall clock with
device-sync option), ``device_memory_stats`` (HBM residency = the RSS
analogue), and ``trace`` wrapping ``jax.profiler`` for real timeline
profiling. Search counters live on BeamResult / HNSWIndex.metric_*.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StopW:
    """sift_1m.cpp's StopW: micro-second stopwatch."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()

    def micros(self) -> float:
        return (time.perf_counter() - self._t0) * 1e6

    def seconds(self) -> float:
        return time.perf_counter() - self._t0


@contextlib.contextmanager
def timed(sync=None):
    """Context manager yielding a StopW; optionally blocks on a jax array
    (or pytree) before stopping so device work is included."""
    w = StopW()
    yield w
    if sync is not None:
        jax.tree.map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x,
            sync,
        )
    w.elapsed = w.seconds()


def device_memory_stats(device=None) -> dict:
    """HBM usage of the target device — the getCurrentRSS analogue."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
        "bytes_limit": stats.get("bytes_limit", -1),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler timeline trace around a code block (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
