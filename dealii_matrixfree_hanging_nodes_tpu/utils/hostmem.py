"""Host-memory tuning for setup-phase NumPy performance.

On virtualized single-core hosts (e.g. Firecracker VMs), two glibc/kernel
behaviors make large fresh NumPy temporaries pathologically slow (~100x):

1. glibc's *dynamic* mmap threshold: after the first large free, big buffers
   are served from the sbrk heap whose first-touch faults are slow under the
   VMM. Pinning M_MMAP_THRESHOLD keeps large blocks on fresh mmaps.
2. Transparent-hugepage direct compaction on madvised regions (NumPy madvises
   MADV_HUGEPAGE for >=4 MB buffers): each 2 MB fault can stall ~100 ms.
   PR_SET_THP_DISABLE neutralizes the madvise process-wide.

Measured on this host: a 3x32 MB alloc chain drops from ~7.4 s to ~0.1 s.
Both knobs are harmless no-ops elsewhere; failures are ignored.
"""

from __future__ import annotations

import ctypes
import sys

_done = False


def tune_host_memory() -> None:
    global _done
    if _done or not sys.platform.startswith("linux"):
        return
    _done = True
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        PR_SET_THP_DISABLE = 41
        libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 20)
    except Exception:  # pragma: no cover - best effort
        pass
