"""Allocator tuning for numpy-heavy workers.

In this environment, freshly mmap'd pages fault in at ~25 MB/s, so
numpy's default behavior for large arrays (malloc -> mmap -> munmap on
free) makes every >1 MiB temporary cost ~40 ms per MB — a 64 MB
resampling temporary took ~2.6 s to allocate. Raising the glibc
mmap/trim thresholds keeps large allocations on the reused program heap:
first touch pays once, every later allocation of similar size is ~1000x
faster.

Trade-off: worker RSS stays at its high-water mark (the heap is never
trimmed). Our stages bound their working set by batch_size, so this is
the right trade for steady-state throughput.

Applied once at package import (harmless no-op off glibc).
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def apply() -> bool:
    global _applied
    if _applied:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _applied = True
    except OSError:  # pragma: no cover - non-glibc platform
        pass
    return _applied
