"""Timing and profiling utilities (SURVEY §5 tracing analog).

The reference fences each repetition with MPI_Barrier and reduces min/avg/max
over ranks (benchmark_01.h:536-575); its hardware-counter path is LIKWID
markers. Here:

- ``repeat_timed`` measures a jitted step honestly on asynchronous/remote
  backends: repetitions are chained (each consumes the previous result) and
  the measurement closes with a device-to-host fetch — the only reliable sync
  point on tunneled TPU runtimes where block_until_ready can return early.
- ``trace`` wraps jax.profiler for XPlane traces (the LIKWID-marker analog:
  per-kernel hardware utilization from the TPU profiler).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["repeat_timed", "repeat_timed_paired", "trace", "TimingResult", "sync_fetch"]


def sync_fetch(x):
    """True sync point with an O(1)-byte host transfer.

    Slices ONE element on-device (the slice op depends on the whole chained
    result, so fetching it waits for the chain) and transfers only that
    element. ``np.asarray(x)`` — the previous sync — dragged the FULL result
    through the tunnel (~88 MB for the nref=7 p=4 brick vector), an additive
    ~1.2 s per window at the link's ~70 MB/s that inflated every chunked A/B
    window: round-3 measured the same vmult at 150 ms/rep (10-rep chunks,
    full fetch), 28 ms/rep (100-rep windows, full fetch) and 14 ms/rep
    (bench.py, tiny-slice fetch). DCE cannot elide the chain: each rep is its
    own dispatched executable, only the final slice is fetched.
    """
    return np.asarray(x.ravel()[:1])


class TimingResult:
    def __init__(self, times):
        self.times = list(times)

    @property
    def min(self):
        return float(np.min(self.times))

    @property
    def max(self):
        return float(np.max(self.times))

    @property
    def avg(self):
        return float(np.mean(self.times))

    def __repr__(self):
        return f"TimingResult(min={self.min:.4e}, avg={self.avg:.4e}, max={self.max:.4e})"


def repeat_timed(step, x0, n_reps: int = 100, n_trials: int = 3,
                 sync_each: bool = False) -> TimingResult:
    """Time ``x = step(x)`` chains; returns per-rep seconds over trials.

    step must map a device array to a like-shaped device array. The chain is
    re-seeded from x0 each trial; each trial ends with a host fetch.

    sync_each=True fences every repetition (block_until_ready) — the analog
    of the reference's per-rep MPI_Barrier (benchmark_01.h:538). Required on
    the virtual multi-device CPU mesh: async-dispatching many chained
    programs with collectives floods the single core's thread pool with
    spinning rendezvous threads until the collective deadlocks.
    """
    x = step(x0)
    _ = sync_fetch(x)  # compile + hard sync
    times = []
    for _trial in range(n_trials):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n_reps):
            x = step(x)
            if sync_each:
                x.block_until_ready()
        _ = sync_fetch(x)
        times.append((time.perf_counter() - t0) / n_reps)
    return TimingResult(times)


def repeat_timed_paired(steps, x0s, n_reps: int = 100, n_trials: int = 3,
                        chunk: int | None = 10):
    """Time several step functions with INTERLEAVED trials.

    On tunneled/remote backends throughput drifts several-fold between
    minutes, so timing config A's trials minutes before config B's corrupts
    A/B ratios (e.g. the ±constraints overhead pair, benchmark_03.h:510-532).
    Interleaving — trial t runs every config back to back — puts each pair of
    measurements in the same weather window; the per-config min then gives a
    drift-resistant ratio. Returns a list of TimingResult, one per step.

    chunk: alternate the configs every ``chunk`` reps INSIDE a trial (each
    chunk fetch-synced), recording one time per chunk. Weather can shift in
    the middle of a 100-rep block — round-3 measured per-window overheads
    swinging -31%..+99% at nref=8 — while adjacent ~10-rep chunks share
    their window, so per-chunk ratios (median over chunks) bound the true
    overhead far tighter. chunk=None restores whole-trial blocks.
    """
    for step, x0 in zip(steps, x0s):
        _ = sync_fetch(step(x0))  # compile + hard sync
    times = [[] for _ in steps]
    if chunk is None or chunk >= n_reps:
        for _trial in range(n_trials):
            for i, (step, x0) in enumerate(zip(steps, x0s)):
                x = x0
                t0 = time.perf_counter()
                for _ in range(n_reps):
                    x = step(x)
                _ = sync_fetch(x)
                times[i].append((time.perf_counter() - t0) / n_reps)
        return [TimingResult(t) for t in times]
    n_rounds = max(1, n_reps // chunk)
    for _trial in range(n_trials):
        for _round in range(n_rounds):
            for i, (step, x0) in enumerate(zip(steps, x0s)):
                x = x0
                t0 = time.perf_counter()
                for _ in range(chunk):
                    x = step(x)
                _ = sync_fetch(x)
                times[i].append((time.perf_counter() - t0) / chunk)
    return [TimingResult(t) for t in times]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mfhn-trace"):
    """Profiler region (LIKWID_MARKER_START/STOP analog) -> XPlane trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
