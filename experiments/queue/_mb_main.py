"""Mesh-free microbenchmark of the brick main path (Kronecker-separable
Laplace apply) at benchmark shapes, several formulations in one weather
window. nb=4219 ~ quadrant nref=7; nb=33238 ~ nref=8 (p=4, NB=17)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from dealii_matrixfree_hanging_nodes_tpu.utils.timing import repeat_timed_paired

NB = 17
N3 = NB**3          # 4913
N3p = 4992
NXY = NB * NB       # 289

rng = np.random.default_rng(0)
Fxy = jnp.asarray(rng.standard_normal((NXY, NXY)).astype(np.float32) * 1e-2)
Mxy = jnp.asarray(rng.standard_normal((NXY, NXY)).astype(np.float32) * 1e-2)
Mb = jnp.asarray(rng.standard_normal((NB, NB)).astype(np.float32) * 1e-1)
Kb = jnp.asarray(rng.standard_normal((NB, NB)).astype(np.float32) * 1e-1)


def current(bv, geo):
    nb = bv.shape[0]
    dt = bv.dtype
    u3 = bv[:, :N3].reshape(nb, NB, NXY)
    t = jnp.dot(u3, Fxy.T, preferred_element_type=dt)
    t = jnp.einsum("wz,bzr->bwr", Mb, t, preferred_element_type=dt)
    s = jnp.einsum("wz,bzr->bwr", Kb, u3, preferred_element_type=dt)
    v = (t + jnp.dot(s, Mxy.T, preferred_element_type=dt)).reshape(nb, N3)
    v = jnp.pad(v, ((0, 0), (0, N3p - N3)))
    return v * geo[:, None]


def flat2d(bv, geo):
    """Same contractions but z-contractions expressed as dot_general on
    dim 1 directly (no einsum-named transposes; XLA picks layouts)."""
    nb = bv.shape[0]
    dt = bv.dtype
    u3 = bv[:, :N3].reshape(nb, NB, NXY)
    t = jnp.dot(u3, Fxy.T, preferred_element_type=dt)  # [b, z, r]
    t = jax.lax.dot_general(
        t, Mb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dt,
    )  # [b, r, w]
    s = jax.lax.dot_general(
        u3, Kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dt,
    )  # [b, q, w]
    s = jax.lax.dot_general(
        s, Mxy, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dt,
    )  # [b, w, r']
    v = (jnp.swapaxes(t, 1, 2) + s).reshape(nb, N3)
    v = jnp.pad(v, ((0, 0), (0, N3p - N3)))
    return v * geo[:, None]


NXYP = 384  # xy-plane padded to 3 lanes


def pallas_fused(bv, geo):
    """Relayout [nb, N3p] -> [nb*NB, NXYP] (z-plane rows) outside the
    kernel; inside, the whole main path is four aligned 2-D matmuls per
    block (xy contractions vs padded operators; z contractions vs the
    block-diagonal I_BLK (x) Mb/Kb), one VMEM round trip per volume."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = bv.shape[0]
    BLK = 16
    P = jax.lax.Precision.HIGHEST

    FxyP = jnp.zeros((NXYP, NXYP), jnp.float32).at[:NXY, :NXY].set(Fxy)
    MxyP = jnp.zeros((NXYP, NXYP), jnp.float32).at[:NXY, :NXY].set(Mxy)
    eye = jnp.eye(BLK, dtype=jnp.float32)
    Lm = jnp.kron(eye, Mb)   # [BLK*NB, BLK*NB]
    Lk = jnp.kron(eye, Kb)

    u2 = jnp.pad(
        bv[:, :N3].reshape(nb * NB, NXY), ((0, 0), (0, NXYP - NXY))
    )
    geo_rows = jnp.repeat(geo, NB)[:, None]

    def kernel(u_ref, fxy_ref, mxy_ref, lm_ref, lk_ref, geo_ref, o_ref):
        dt = jnp.float32
        u = u_ref[:]
        t = jnp.dot(u, fxy_ref[:].T, preferred_element_type=dt, precision=P)
        t = jnp.dot(lm_ref[:], t, preferred_element_type=dt, precision=P)
        s = jnp.dot(lk_ref[:], u, preferred_element_type=dt, precision=P)
        s = jnp.dot(s, mxy_ref[:].T, preferred_element_type=dt, precision=P)
        o_ref[:] = (t + s) * geo_ref[:]

    R = BLK * NB
    nblk = nb // BLK
    v2 = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((R, NXYP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, NXYP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * NB, NXYP), jnp.float32),
    )(u2, FxyP, MxyP, Lm, Lk, geo_rows)
    v = v2[:, :NXY].reshape(nb, N3)
    return jnp.pad(v, ((0, 0), (0, N3p - N3)))


def check_and_time(nb, n_reps):
    print(f"--- nb={nb} ({nb*N3/1e6:.1f} M nodes)", flush=True)
    bv = jnp.asarray(
        rng.standard_normal((nb, N3p)).astype(np.float32)
    )
    geo = jnp.asarray(rng.standard_normal(nb).astype(np.float32))
    scale = jnp.float32(1e-3)
    with jax.default_matmul_precision("tensorfloat32"):
        r0 = current(bv, geo)
        r1 = flat2d(bv, geo)
        r2 = pallas_fused(bv, geo)
        # on-device comparison: fetching full volumes through the tunnel
        # takes minutes and host NumPy is 50-100x degraded post-init
        s = jnp.abs(r0).max()
        e1 = float(jnp.abs(r1 - r0).max() / s)
        e2 = float(jnp.abs(r2 - r0).max() / s)
    print(f"  flat2d err {e1:.2e}  pallas err {e2:.2e}", flush=True)

    fns = {
        "stream": jax.jit(lambda x: x * scale),
        "current": jax.jit(lambda x: current(x * scale, geo)),
        "flat2d": jax.jit(lambda x: flat2d(x * scale, geo)),
        "pallas": jax.jit(lambda x: pallas_fused(x * scale, geo)),
    }
    def wrap(f):
        def g(x):
            with jax.default_matmul_precision("tensorfloat32"):
                return f(x)
        return g
    names = list(fns)
    res = repeat_timed_paired(
        [wrap(fns[n]) for n in names], [bv] * len(names),
        n_reps=n_reps, n_trials=3,
    )
    bw = nb * N3p * 4 * 2  # one read + one write of the volume
    for n, r in zip(names, res):
        print(f"  {n:<8} min {r.min*1e3:9.3f} ms  avg {r.avg*1e3:9.3f} ms  "
              f"eff-bw {bw/r.min/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    check_and_time(33248, 15)
    check_and_time(4224, 40)
    print("DONE-ALL")
