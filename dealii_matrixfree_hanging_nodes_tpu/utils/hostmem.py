"""Host-memory tuning for setup-phase NumPy performance.

On virtualized single-core hosts (e.g. Firecracker VMs), two glibc/kernel
behaviors make large fresh NumPy temporaries pathologically slow (~100x):

1. glibc's *dynamic* mmap threshold: after the first large free, big buffers
   are served from the sbrk heap whose first-touch faults are slow under the
   VMM. Pinning M_MMAP_THRESHOLD keeps large blocks on fresh mmaps.
2. Transparent-hugepage direct compaction on madvised regions (NumPy madvises
   MADV_HUGEPAGE for >=4 MB buffers): each 2 MB fault can stall ~100 ms.
   PR_SET_THP_DISABLE neutralizes the madvise process-wide.

3. Beyond ~8-9 GB of resident memory, FRESH page faults collapse to
   ~20-40 MB/s (VMM lazily backs the rest of guest RAM), while pages
   faulted once stay fast (>4 GB/s re-touch) — measured with a cumulative
   allocation sweep. Setting M_MMAP_MAX=0 serves every allocation from the
   sbrk heap, so freed pages stay mapped and large setup temporaries REUSE
   already-faulted pages instead of paying the slow fault path again. This
   turned a 1.6 GB temporary churned at high RSS from ~80 s to ~0.8 s and
   is the main reason benchmark_03's nref=8/9 setup is feasible.

Measured on this host: a 3x32 MB alloc chain drops from ~7.4 s to ~0.1 s.
All knobs are harmless no-ops elsewhere; failures are ignored.
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
        M_MMAP_MAX = -4
        libc.mallopt(M_MMAP_MAX, 0)  # sbrk heap: freed pages stay mapped
        # ... but glibc TRIMS the heap top on free (default threshold
        # 128 kB), unmapping exactly the pages we want to keep — later
        # phases then refault them at the slow rate. Disable trimming.
        M_TRIM_THRESHOLD = -1
        libc.mallopt(M_TRIM_THRESHOLD, 0x7FFFFFFF)
    except Exception:  # pragma: no cover - best effort
        pass
