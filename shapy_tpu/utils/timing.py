"""Chained-loop device timing: the repo's one benchmark methodology.

Replaces the reference's wall-clock-with-cuda-synchronize protocol
(regressor/demo.py:230-237) with a tunnel-robust equivalent for TPU:

1. run k iterations CHAINED inside one jitted ``lax.fori_loop`` (each
   iteration's output feeds the next, so XLA cannot parallelise or hoist
   them), reduced to ONE scalar on device;
2. fetch the scalar with ``float()`` (a device sync — do NOT time
   ``block_until_ready`` on a large output, which adds transfer time);
3. difference two chain lengths: (t[k1] - t[k0]) / (k1 - k0) cancels the
   per-dispatch overhead (tunnel RTT ~100 ms here) exactly;
4. take min over repeats to reject scheduling jitter.

Callers build their own jitted ``run(*args, k)`` with a DYNAMIC trip
count (pass k as a traced scalar, e.g. ``jnp.int32(k)``) so both chain
lengths share one compilation — tunnel compiles of big graphs cost
minutes each.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple


def chained_device_ms(
    run: Callable,
    args: Tuple,
    ks: Sequence[int] = (2, 10),
    reps: int = 3,
    verbose: bool = False,
) -> float:
    """Per-iteration device milliseconds of ``run(*args, k)``.

    ``run`` must execute ``k`` chained iterations on device and return a
    scalar; it is called with ``k`` as a plain int (jit it with a traced
    k argument to keep one compilation for all chain lengths).
    """
    t0 = time.perf_counter()
    _ = float(run(*args, ks[0]))  # compile + warm
    if verbose:
        print(f"  [compile+warm {time.perf_counter() - t0:.1f}s]",
              flush=True)
    best = {}
    for k in ks:
        times = []
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(run(*args, k))
            times.append(time.perf_counter() - t0)
        best[k] = min(times)
        if verbose:
            print(f"  k={k}: {best[k]:.3f}s", flush=True)
    k0, k1 = ks[0], ks[-1]
    return (best[k1] - best[k0]) / (k1 - k0) * 1000.0
