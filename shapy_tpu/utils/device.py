"""Accelerator-runtime failure detection for batch/cluster entry points.

The reference exits with code 3 when CUDA is unavailable or device
initialisation fails (``regressor/demo.py:136-139,155-159``) so cluster
schedulers treat the run as a resubmittable infrastructure failure rather
than a job bug.  The TPU equivalent: JAX backend initialisation raising
(no TPU reachable, tunnel/runtime down).  A CPU-only JAX is still a valid
backend — the test suite and host-side tools run that way on purpose — so
only an initialisation *error* maps to exit 3, never a platform choice.
"""

from __future__ import annotations

import sys

DEVICE_FAILURE_EXIT_CODE = 3


def raise_open_file_limit() -> None:
    """Raise RLIMIT_NOFILE's soft limit to the hard limit.

    Reference ``regressor/demo.py:31-32`` / ``evaluate.py:29-30``: the
    data loaders hold many image files + worker pipes open; the default
    soft limit (often 1024) can be exhausted on large datasets.  No-op on
    platforms without the resource module or without permission.
    """
    try:
        import resource

        _, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        resource.setrlimit(resource.RLIMIT_NOFILE, (hard, hard))
    except (ImportError, ValueError, OSError):
        pass


def exit_on_device_failure() -> None:
    """Probe JAX backend init; ``sys.exit(3)`` on failure.

    Call at the top of CLI ``__main__`` blocks that are expected to run
    under a scheduler (demo, evaluate, train).  Importing jax is deferred
    so argparse ``--help`` stays instant.
    """
    import jax

    try:
        devices = jax.devices()
    except RuntimeError as exc:
        print(
            f"Accelerator runtime initialisation failed: {exc}",
            file=sys.stderr,
        )
        sys.exit(DEVICE_FAILURE_EXIT_CODE)
    if not devices:  # defensive; jax raises rather than returning []
        print("No JAX devices available", file=sys.stderr)
        sys.exit(DEVICE_FAILURE_EXIT_CODE)
