"""Per-op device-time profile of the brick-engine vmult (constrained and
plain), the LIKWID-counter analog at HLO-fusion granularity (reference:
experiments/run-exp2.sh drives MEM/FLOPS_DP groups around the same kernel).

Records one XPlane trace per variant of a chained rep loop, then attributes
device time per fused HLO op (name-aggregated across reps) so the remaining
hanging-node overhead and the distance to the HBM/MXU roofline are visible
op by op.

  python experiments/profile_vmult.py [nref] [degree] [reps]

Prints two tables (constrained / plain) and a diff summary, then
PROFILE-VMULT-DONE.
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dealii_matrixfree_hanging_nodes_tpu.utils.timing import sync_fetch  # noqa: E402


def parse_device_ops(log_dir):
    """Aggregate device-plane event durations by op name from an XPlane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return {}, 0.0
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    def collect(planes, line_filter):
        per_op = defaultdict(lambda: [0.0, 0])
        total = 0.0
        for p in planes:
            for ln in p.lines:
                if not line_filter(ln.name):
                    continue
                for ev in ln.events:
                    md = p.event_metadata[ev.metadata_id]
                    us = ev.duration_ps / 1e6
                    per_op[md.name][0] += us
                    per_op[md.name][1] += 1
                    total += us
        return per_op, total

    dev_planes = [p for p in xs.planes
                  if "TPU" in p.name or "device" in p.name.lower()]
    per_op, total = collect(
        dev_planes,
        # XLA Ops / XLA Modules lines both exist; modules double-count.
        lambda n: "module" not in n.lower() and "step" not in n.lower())
    if total == 0.0:  # CPU fallback (smoke tests): the PjRt client line
        per_op, total = collect(xs.planes, lambda n: "xla" in n.lower())
    return per_op, total


def profile_step(tag, step, x0, n_reps):
    import jax

    scale = None
    y = step(x0)
    _ = sync_fetch(y)  # compile + sync
    log_dir = f"/tmp/mfhn-profile-{tag}"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n_reps):
        x = step(x)
    _ = sync_fetch(x)
    wall = (time.perf_counter() - t0) / n_reps
    jax.profiler.stop_trace()
    return log_dir, wall


def report(tag, per_op, total_us, n_reps, top=40):
    print(f"\n=== {tag}: device total {total_us/n_reps:.0f} us/rep "
          f"({total_us:.0f} us over {n_reps} reps) ===")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/rep':>10} {'%':>6} {'calls':>6}  op")
    for name, (us, cnt) in rows[:top]:
        print(f"{us/n_reps:10.1f} {100*us/total_us:6.2f} {cnt:6d}  {name[:110]}")
    return {name: us / n_reps for name, (us, cnt) in rows}


def main():
    nref = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    import jax
    import jax.numpy as jnp
    import dealii_matrixfree_hanging_nodes_tpu as mfhn
    from dealii_matrixfree_hanging_nodes_tpu.matrix_free import MatrixFree
    from dealii_matrixfree_hanging_nodes_tpu.bricks import BrickLaplaceMM

    tria = mfhn.create_quadrant(3, nref)
    mf = MatrixFree(tria, degree=degree, dtype=np.float32)
    op = BrickLaplaceMM(mf, matmul_precision=os.environ.get(
        "BENCH_PRECISION", "high"))
    rng = np.random.default_rng(0)
    src = op.from_dof_vector(
        rng.standard_normal(mf.n_dofs).astype(np.float32))
    scale = jnp.float32(1e-3)

    variants = [
        ("constrained", lambda x: op.vmult(x * scale)),
        ("plain", lambda x: op.vmult_plain(x * scale)),
    ]
    summaries = {}
    walls = {}
    logs = {}
    for tag, step in variants:
        logs[tag], walls[tag] = profile_step(tag, step, src, n_reps)

    # parse after all traces are taken (tensorflow import is heavy)
    for tag, _ in variants:
        per_op, total = parse_device_ops(logs[tag])
        summaries[tag] = report(tag, per_op, total, n_reps)
        print(f"{tag}: wall {walls[tag]*1e3:.2f} ms/rep, device "
              f"{total/n_reps/1e3:.2f} ms/rep")

    if len(summaries) == 2:
        c, p = summaries["constrained"], summaries["plain"]
        tc, tp = sum(c.values()), sum(p.values())
        print(f"\n=== constrained-only ops (device {tc:.0f} vs {tp:.0f} "
              f"us/rep, +{100*(tc-tp)/tp:.1f}%) ===")
        rows = sorted(
            ((us - p.get(name, 0.0), name) for name, us in c.items()),
            reverse=True)
        for dus, name in rows[:25]:
            if dus <= 0.05:
                break
            print(f"{dus:10.1f} us/rep  {name[:110]}")
    print("PROFILE-VMULT-DONE")


if __name__ == "__main__":
    main()
