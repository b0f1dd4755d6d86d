"""Allocator tuning for page-fault-expensive sandboxed kernels.

On this environment, first-touch page faults on freshly mmap'd memory cost
~1ms/page, so every large numpy temporary (glibc routes allocations >128KB
to mmap, munmapped on free) pays ~0.4s/MB — a 1000× slowdown on vectorized
kernels.  Raising the malloc mmap/trim thresholds keeps large buffers on the
main heap, where pages fault once per worker and are reused across batches
(steady-state allocations become normal speed).

``apply()`` uses mallopt(3) via ctypes so it also fixes *running* processes
(Ray workers spawned before our code could set environment variables).
Called at package import — drivers, workers and tests all pass through it.
"""

from __future__ import annotations

import ctypes
import os

_APPLIED = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def apply() -> bool:
    """Idempotently raise malloc thresholds in this process and export the
    matching env vars so child processes (Ray raylet → workers) start tuned."""
    global _APPLIED
    if _APPLIED:
        return True
    # children read these at startup
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _APPLIED = bool(ok1 and ok2)
    except OSError:
        _APPLIED = False
    return _APPLIED


apply()
