"""Per-operator format probe on the checkpointed 1M 3-D hierarchy:
times the fine-level A in hybrid/WELL variants and the level-0 P/R in
their current slab formats vs a RECTANGULAR WELL — the decision data for
the round-5 V-cycle fix (VERDICT r4: P 24.9 ms / R 26.8 ms of the
100 ms cycle; reference cycle structure multigrid.rs:269-380 applies
P/R once per level per cycle, so these two ops alone are half the
cycle).

Usage: python tools/probe3d.py [--side 101] [--ckpt /tmp/h3d_1M.npz]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.ravel(x)[0]))


def timed_spec(op, x, reps, trials=3, label=""):
    """Operator-SPECIALIZED chained timing (op closed over).  Falls back
    to argument-passing on the tunnel's HTTP-413 program-size limit."""
    import jax
    import jax.numpy as jnp

    def chain_body(o, v):
        def body(carry, _):
            u, acc = carry
            bump = jnp.where(jnp.isnan(acc), 1.0, 0.0).astype(u.dtype)
            u2 = o.mv(u + bump)
            if u2.shape != u.shape:
                return (u, acc + u2.ravel()[0]), None
            return (u2, acc), None

        (u, acc), _ = jax.lax.scan(
            body, (v, jnp.zeros((), jnp.float32)), None, length=reps
        )
        return u.ravel()[0] + acc

    spec = jax.jit(lambda v: chain_body(op, v))
    arg = jax.jit(chain_body)
    mode = "spec"
    try:
        _sync(spec(x))
        run = spec
    except Exception as e:  # noqa: BLE001
        if "413" not in str(e) and "length limit" not in str(e):
            raise
        mode = "arg"
        _sync(arg(op, x))
        run = lambda v: arg(op, v)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(run(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"# {label} [{mode}]: {best*1e3:.3f}ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=101)
    ap.add_argument("--ckpt", type=str, default="/tmp/h3d_1M.npz")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_amg.utils.platform import apply_env_platform

    apply_env_platform()
    reps = args.reps if jax.devices()[0].platform == "tpu" else 2

    from tpu_amg.sparse.hybrid import try_hybrid_or_well
    from tpu_amg.sparse.well import WELL, WellUnsupported
    from tpu_amg.linop import SparseOperator, TransposeOperator
    from tpu_amg.utils.checkpoint import load_hierarchy
    from tpu_amg.utils.reorder import (
        block_rcm_permutation, permute_symmetric, permute_rows,
        permute_cols, bandwidth,
    )

    t0 = time.perf_counter()
    h = load_hierarchy(args.ckpt)
    print(f"# hierarchy loaded {time.perf_counter()-t0:.0f}s, "
          f"{h.num_levels} levels", flush=True)

    a0 = h.get_op(0)
    p0 = h.get_interpolation(0)
    r0 = h.get_restriction(0)
    a1 = h.get_op(1)
    print(f"# A0 {a0.shape} nnz={a0.nnz}; P0 {p0.shape} nnz={p0.nnz} "
          f"rowmax={int(p0.row_nnz().max())}; R0 {r0.shape} "
          f"nnz={r0.nnz} rowmax={int(r0.row_nnz().max())}", flush=True)

    x0 = jnp.ones(a0.shape[0], dtype=jnp.float32)
    xc = jnp.ones(p0.shape[1], dtype=jnp.float32)

    # ---- fine A variants ---------------------------------------------
    t0 = time.perf_counter()
    hyb = try_hybrid_or_well(a0, dtype=jnp.float32)
    print(f"# fine build {time.perf_counter()-t0:.0f}s: {hyb}", flush=True)
    timed_spec(hyb, x0, reps, label="A0 hybrid       ")
    t0 = time.perf_counter()
    hyb_l = try_hybrid_or_well(a0, dtype=jnp.float32, idroute=False)
    print(f"# fine legacy build {time.perf_counter()-t0:.0f}s: {hyb_l}",
          flush=True)
    timed_spec(hyb_l, x0, reps, label="A0 hybrid legacy")

    # ---- level-1 operator (RCM'd, as the builder does) ----------------
    perm1 = block_rcm_permutation(a1)
    a1p = permute_symmetric(a1, perm1)
    print(f"# A1 {a1.shape} nnz={a1.nnz} bw {bandwidth(a1)} -> "
          f"{bandwidth(a1p)}", flush=True)
    t0 = time.perf_counter()
    hyb1 = try_hybrid_or_well(a1p, dtype=jnp.float32)
    print(f"# A1 build {time.perf_counter()-t0:.0f}s: {hyb1}", flush=True)
    x1 = jnp.ones(a1.shape[0], dtype=jnp.float32)
    timed_spec(hyb1, x1, reps, label="A1 hybrid (rcm) ")

    # ---- P/R current formats (what multigrid_builder picks) -----------
    t0 = time.perf_counter()
    p_op = SparseOperator.from_csr(p0, dtype=jnp.float32)
    print(f"# P build {time.perf_counter()-t0:.0f}s: "
          f"{type(p_op.ell).__name__}", flush=True)
    timed_spec(p_op, xc, reps, label="P0 current      ")
    r_op = TransposeOperator(base=p_op)
    timed_spec(r_op, x0, reps, label="R0 as P^T       ")

    # ---- P/R as rectangular WELL --------------------------------------
    for label, csr, xin in (("P0 rect-WELL    ", p0, xc),
                            ("R0 rect-WELL    ", r0, x0)):
        t0 = time.perf_counter()
        try:
            w = WELL.from_csr(csr, dtype=jnp.float32, block=4)
        except WellUnsupported as e:
            print(f"# {label}: unsupported ({e})", flush=True)
            continue
        print(f"# build {time.perf_counter()-t0:.0f}s: {w}", flush=True)
        timed_spec(w, xin, reps, label=label)


if __name__ == "__main__":
    main()
