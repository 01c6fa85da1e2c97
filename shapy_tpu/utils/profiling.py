"""Profiling / tracing utilities.

The reference's tracing story is a wall-clock Timer + opt-in CUDA event
prints (SURVEY §5). The TPU-native equivalents wrap ``jax.profiler``:
xprof traces viewable in TensorBoard / Perfetto, plus named annotation
contexts that show up on the device timeline.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/shapy_tpu_trace",
          create_perfetto_link: bool = False) -> Iterator[str]:
    """Capture a device trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible on the xprof timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory statistics (allocated / peak, bytes)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except (AttributeError, jax.errors.JaxRuntimeError):
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
