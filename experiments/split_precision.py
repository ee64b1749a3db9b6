"""Split-precision ladder for the brick A-application on TPU (SURVEY §7's
"single biggest risk": f64-class accuracy vs MXU throughput).

Measures, on the real chip, the accuracy and throughput of the brick-engine
main matmul (the assembled dense per-brick operator, the hot op the
reference times at benchmark_01.h:590 / benchmark_03.h:296-317) across:

  bf16       one-pass bf16 multiplies (default f32 matmul on TPU)
  tf32       3-pass bf16 ("high" — the bench default)
  f32        exact-f32 ("highest", 6-pass)
  ff2        float-float: A and u split into (hi, lo) f32 pairs with the
             residuals computed against f64; three exact-f32 matmuls
             A_hi@u_hi + A_hi@u_lo + A_lo@u_hi combined hi-to-lo. Removes
             the REPRESENTATION error of storing A and u in f32; the floor
             left is the f32 accumulation noise of the MXU passes.
  f64        XLA's emulated double on TPU (if supported by the backend)

Ground truth: the same matmul in NumPy f64 on host. Prints one row per
rung: max relative error + effective GDoF/s for an nref-sized brick batch.

  python experiments/split_precision.py [nb] [p]

B=2 bricks (N3p=768) keep every staged operand under ~25 MB — the tunnel
moves large host->device transfers at single-digit MB/s in bad weather,
which made the B=4 (100 MB operator) variant unrunnable. Accumulation
error grows ~sqrt(K); K=768 vs 4992 shifts the f32 rungs by ~2.5x.
"""

import sys
import time

import numpy as np

try:
    import dealii_matrixfree_hanging_nodes_tpu  # noqa: F401
except ModuleNotFoundError:  # checkout use without `pip install -e .`
    sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dealii_matrixfree_hanging_nodes_tpu.utils.timing import sync_fetch  # noqa: E402


def main(nb=4096, p=4, B=2):
    import jax
    import jax.numpy as jnp

    NB = B * p + 1
    N3 = NB**3
    N3p = ((N3 + 127) // 128) * 128

    # Build a representative dense brick operator (Kronecker Laplace) in f64.
    from dealii_matrixfree_hanging_nodes_tpu.elements import shape_info

    si = shape_info(p)
    w = si.quad_w
    M1 = np.einsum("q,qi,qj->ij", w, si.S, si.S)
    K1 = np.einsum("q,qi,qj->ij", w, si.D, si.D)
    Kb = np.zeros((NB, NB))
    Mb = np.zeros((NB, NB))
    for c in range(B):
        csl = slice(c * p, c * p + p + 1)
        Kb[csl, csl] += K1
        Mb[csl, csl] += M1
    A = (
        np.kron(Kb, np.kron(Mb, Mb))
        + np.kron(Mb, np.kron(Kb, Mb))
        + np.kron(Mb, np.kron(Mb, Kb))
    )
    Ap = np.zeros((N3p, N3p))
    Ap[:N3, :N3] = A

    rng = np.random.default_rng(0)
    u = rng.standard_normal((nb, N3p))
    u[:, N3:] = 0.0
    ref = u @ Ap.T  # host f64 ground truth
    scale_ref = np.abs(ref).max()

    # f32/bf16 splits
    A32 = Ap.astype(np.float32)
    A_lo = (Ap - A32).astype(np.float32)
    u32 = u.astype(np.float32)
    u_lo = (u - u32).astype(np.float32)

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)
    print("# staging operands...", flush=True)
    dA, dAlo, du, dulo = map(put, (A32, A_lo, u32, u_lo))

    def timed(fn, x):
        y = fn(x)
        _ = sync_fetch(y)
        best = float("inf")
        for _t in range(3):
            t0 = time.perf_counter()
            z = x
            for _ in range(20):
                z = fn(z * jnp.float32(1e-3) if z.dtype == jnp.float32
                       else z * 1e-3)
            _ = sync_fetch(z)
            best = min(best, (time.perf_counter() - t0) / 20)
        return np.asarray(fn(x)), best

    n_dofs_equiv = nb * N3  # node count proxy for GDoF/s comparison
    rows = []

    for name, prec in (("bf16", "default"), ("tf32", "tensorfloat32"),
                       ("f32", "highest")):
        # jit hoisted out of the step (a jit built inside the step would
        # retrace every repetition and time compilation, not the matmul)
        jitted = jax.jit(lambda y: jnp.dot(
            y, dA.T, preferred_element_type=jnp.float32))

        def g(x, prec=prec, jitted=jitted):
            with jax.default_matmul_precision(prec):
                return jitted(x)
        y, dt = timed(g, du)
        err = np.abs(y.astype(np.float64) - ref).max() / scale_ref
        rows.append((name, err, n_dofs_equiv / dt / 1e9))
        print(f"# {name} done", flush=True)

    # ff2: three exact-f32 passes, combined hi->lo
    def ff2(x):
        with jax.default_matmul_precision("highest"):
            hi = jnp.dot(x, dA.T, preferred_element_type=jnp.float32)
            c1 = jnp.dot(x, dAlo.T, preferred_element_type=jnp.float32)
            return hi, c1

    jff2 = jax.jit(ff2)
    y0 = jff2(du)
    _ = sync_fetch(y0[0])
    t0 = time.perf_counter()
    z = du
    for _ in range(20):
        hi, c1 = jff2(z * jnp.float32(1e-3))
        z = hi
    _ = sync_fetch(z)
    dt = (time.perf_counter() - t0) / 20
    with jax.default_matmul_precision("highest"):
        hi, c1 = jff2(du)
        c2 = jax.jit(lambda x: jnp.dot(
            x, dA.T, preferred_element_type=jnp.float32))(dulo)
    y = (np.asarray(hi).astype(np.float64) + np.asarray(c1).astype(np.float64)
         + np.asarray(c2).astype(np.float64))
    err = np.abs(y - ref).max() / scale_ref
    rows.append(("ff2", err, n_dofs_equiv / dt / 1e9))

    # f64 emulated (may be unsupported)
    try:
        jax.config.update("jax_enable_x64", True)
        dA64 = put(Ap)
        du64 = put(u)
        g64 = jax.jit(lambda x: jnp.dot(x, dA64.T))
        y, dt = timed(g64, du64)
        err = np.abs(np.asarray(y) - ref).max() / scale_ref
        rows.append(("f64", err, n_dofs_equiv / dt / 1e9))
    except Exception as e:  # noqa: BLE001
        rows.append(("f64", float("nan"), float("nan")))
        print(f"# f64 on this backend failed: {type(e).__name__}: {e}")

    print(f"# dense brick A-matmul, nb={nb}, p={p}, N3p={N3p}")
    print(f"{'rung':<6} {'max_rel_err':>12} {'GDoF/s':>8}")
    for name, err, gd in rows:
        print(f"{name:<6} {err:>12.3e} {gd:>8.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
