"""Per-stage ablation of the v3 (idroute) block-4 WELL kernel on the 1M
hybrid remainder — timing attribution ONLY (wrong results for every
case but 'full').  Cases: full, justmm (skip merge), nored (skip the
whole reduce), noB / noA (skip a gather stage), streamonly (slab DMA +
FMA + store).  Needs the cached bench matrix at /tmp/bench1M.npz
(bench.py builds it) and the real TPU.

Numbers of record (v5e, 400-rep chains, 6.7M-slot g=20 build):
full 283.8 / justmm 284.0 / nored 238.1 / noB 266.5 / noA 212.8 /
streamonly 190.7 us — see MEASURED.md round-4 section.
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import numpy as np, scipy.sparse as sps
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_amg.utils.platform import apply_env_platform
apply_env_platform()
from tpu_amg.sparse.csr import CSR
from tpu_amg.sparse.hybrid import HybridDiaWell
from tpu_amg.ops.well_pallas import _taa_sub, _taa_lane, LANES, TABLE_ROWS

z = np.load('/tmp/bench1M.npz')
ap = sps.csr_matrix((z['data'], z['indices'], z['indptr']), shape=tuple(z['shape']))
csr = CSR.from_scipy(ap)
h = HybridDiaWell.from_csr(csr, dtype=jnp.float32)
w = h.well
print(f"# {w!r} idroute={w.idroute} mr={w.merge_rounds}", flush=True)

def make_kernel(ablate, n_groups, n_passes, merge_rounds, vregs, bpv):
    def _kernel(q_ref, qv_ref, data_ref, w_ref, rts_ref, x_ref, y_ref,
                cbuf, table_s, gath_s):
        t = pl.program_id(0)
        cdt = x_ref.dtype
        mrows = vregs * TABLE_ROWS
        for f in range(vregs):
            r0 = f * TABLE_ROWS
            wv = w_ref[0, r0:r0+8, :]
            amap = (wv >> 21) & 1023
            eta = amap & 7
            grp = amap >> 3
            qv = pl.multiple_of(qv_ref[t*vregs+f], 8)
            def win_slice(gi, qv=qv):
                return x_ref[pl.ds(qv + gi*8, 8), :]
            if ablate in ("noA", "streamonly"):
                gath = win_slice(0)
            else:
                table_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
                for gi in range(n_groups):
                    part = _taa_sub(win_slice(gi), eta)
                    pltpu.store(table_s, part, mask=grp == gi)
                table = table_s[:]
                if ablate == "noB":
                    gath = table
                else:
                    lam = wv & 127
                    pid = (wv >> 7) & 3
                    gath_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
                    for p in range(n_passes):
                        rowsel = _taa_sub(table, (wv >> (9+3*p)) & 7)
                        val = _taa_lane(rowsel, lam)
                        pltpu.store(gath_s, val, mask=pid == p)
                    gath = gath_s[:]
            cbuf[r0:r0+8, :] = data_ref[0, r0:r0+8, :].astype(cdt) * gath
        if ablate in ("nored", "streamonly"):
            y_ref[0] = cbuf[:, :bpv]
            return
        mblk = (jax.lax.broadcasted_iota(jnp.int32, (LANES, bpv), 0)
                // (LANES // bpv)
                == jax.lax.broadcasted_iota(jnp.int32, (LANES, bpv), 1)
                ).astype(cdt)
        cm = jnp.dot(cbuf[:], mblk, preferred_element_type=cdt,
                     precision=jax.lax.Precision.HIGHEST)
        if ablate == "justmm":
            y_ref[0] = cm
            return
        rts = rts_ref[0]
        if merge_rounds:
            ov = _taa_lane(cm, rts & 31)
            flag = (rts >> 5) & 1
            cm = cm + jnp.where(flag != 0, ov, jnp.zeros_like(cm))
        y_ref[0] = cm
    return _kernel

def run(ablate, reps=400):
    vregs = w.vregs_per_tile; bpv = w.blocks_per_vrow
    mrows = vregs * TABLE_ROWS
    n_tiles = w.data.shape[0]
    kern = make_kernel(ablate, w.n_groups, w.n_passes, w.merge_rounds, vregs, bpv)
    def blockspec(shape):
        return pl.BlockSpec((1,)+shape, lambda t, q, qv: (t,)+(0,)*len(shape),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_tiles,),
        in_specs=[blockspec((mrows, LANES)), blockspec((mrows, LANES)),
                  blockspec((mrows, bpv)), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=blockspec((mrows, bpv)),
        scratch_shapes=[pltpu.VMEM((mrows, LANES), jnp.float32),
                        pltpu.VMEM((TABLE_ROWS, LANES), jnp.float32),
                        pltpu.VMEM((TABLE_ROWS, LANES), jnp.float32)])
    n2d = w.x2d_rows
    xp = jnp.asarray(np.random.default_rng(0).normal(size=(n2d, LANES)).astype(np.float32))
    @jax.jit
    def chain(x2d):
        def call(u):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern, out_shape=jax.ShapeDtypeStruct((n_tiles, mrows, bpv), jnp.float32),
                    grid_spec=grid_spec)(w.q, w.qv, w.data, w.w, w.rts, u)
        def body(u, _):
            out = call(u)
            return u + out[0, 0, 0], None
        u, _ = jax.lax.scan(body, x2d, None, length=reps)
        return u
    def _sync(v): return float(np.asarray(v.ravel()[0]))
    _sync(chain(xp))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _sync(chain(xp))
        best = min(best, (time.perf_counter()-t0)/400)
    print(f"# {ablate:12s} {best*1e6:8.1f}us", flush=True)

for ab in ("full", "justmm", "nored", "noB", "noA", "streamonly"):
    run(ab)
