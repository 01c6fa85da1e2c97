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

            # Block until all dispatched device work is finished.
            jax.effects_barrier()
            for d in jax.live_arrays():
                d.block_until_ready()
                break

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
