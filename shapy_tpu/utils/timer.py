"""Wall-clock timing with device synchronisation.

Behavioural spec: reference ``regressor/human_shape/utils/timer.py:8-24``
(context-manager timer with optional cuda synchronize). The TPU
equivalent synchronises by blocking on outstanding device work; for deep
profiling use ``jax.profiler.trace`` (see :mod:`shapy_tpu.utils.profiling`).
"""

from __future__ import annotations

import time
from typing import List, Optional


class Timer:
    def __init__(self, name: str = "", sync: bool = False,
                 verbose: bool = False):
        self.name = name
        self.sync = sync
        self.verbose = verbose
        self.times: List[float] = []
        self._start: Optional[float] = None

    def _synchronize(self) -> None:
        if self.sync:
            import jax

            # Device execution is in-order per device stream, so
            # enqueueing a trivial computation on each local device and
            # blocking on it waits for everything dispatched before it —
            # the cuda-synchronize equivalent. (Blocking on an arbitrary
            # live array is NOT sufficient: it may already be
            # materialised while later work is still running.)
            jax.effects_barrier()
            fence = jax.jit(lambda x: x + 1.0)
            for d in jax.local_devices():
                fence(jax.device_put(0.0, d)).block_until_ready()

    def __enter__(self) -> "Timer":
        self._synchronize()
        self._start = time.perf_counter()
        return self

    def __exit__(self, *args) -> bool:
        self._synchronize()
        elapsed = time.perf_counter() - self._start
        self.times.append(elapsed)
        if self.verbose:
            print(f"[{self.name}] {elapsed * 1000:.2f} ms "
                  f"(mean {self.mean * 1000:.2f} ms over {len(self.times)})")
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
