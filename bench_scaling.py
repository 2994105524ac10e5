"""Weak-scaling harness: sharded halo-SpMV and PCG across a device mesh.

BASELINE.md target: ≥ 80% weak-scaling efficiency at N ≥ 2 hosts on a
row-partitioned hierarchy.  This harness keeps the per-device row count
fixed, grows the mesh 1 → N devices, and reports SpMV wall-time and
efficiency (t_1 / t_N; ideal = 1.0 under weak scaling).

On a single-chip or CPU session this runs against virtual devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python bench_scaling.py) and validates the communication structure; real
efficiency numbers require a multi-chip slice.

Prints one JSON line per mesh size plus a summary line.
"""

import json
import sys
import time

import numpy as np


def _sync(x):
    # full host transfer (scalar indexing of a sharded array is ambiguous
    # under sharding-in-types; np.asarray gathers and blocks)
    return float(np.asarray(x).ravel()[0])


def main(rows_per_device: int = 65_536, reps: int = 30):
    import os

    import jax

    if not os.environ.get("TPU_AMG_SCALING_REAL"):
        # default: fan out over 8 virtual CPU devices — a single-chip
        # session has nothing to scale across, and jax may be
        # pre-imported by the environment so env vars alone are
        # unreliable; force via config before backend init.
        # Set TPU_AMG_SCALING_REAL=1 on a real multi-chip slice.
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass

    import jax.numpy as jnp

    from tpu_amg.parallel import HaloELL, halo_spmv, make_solver_mesh
    from tpu_amg.parallel.dist import shard_vector
    from tpu_amg.sparse import ELL
    from tpu_amg.utils.problems import poisson2d

    n_devices = len(jax.devices())
    results = []
    t1 = None
    for nd in [d for d in (1, 2, 4, 8, 16) if d <= n_devices]:
        n_total = rows_per_device * nd
        side = int(np.sqrt(n_total))
        # keep rows divisible by the mesh: trim side to multiple of nd
        side -= side % max(nd, 1)
        a = poisson2d(side, side)
        mesh = make_solver_mesh(nd)
        jax.set_mesh(mesh)
        ell = ELL.from_csr(a, dtype=jnp.float32)
        h = HaloELL.from_ell(ell, mesh)
        x = shard_vector(jnp.ones(a.nrows, dtype=jnp.float32), mesh)

        @jax.jit
        def spmv_n(h_, v):
            def body(u, _):
                return halo_spmv(h_, u), None

            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        _sync(spmv_n(h, x))
        t0 = time.perf_counter()
        _sync(spmv_n(h, x))
        dt = (time.perf_counter() - t0) / reps
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        results.append((nd, dt, eff))
        print(
            json.dumps(
                {
                    "metric": f"halo_spmv_weak_scaling_{nd}dev",
                    "value": round(dt * 1e3, 4),
                    "unit": "ms",
                    "vs_baseline": round(eff / 0.8, 4),
                }
            ),
            flush=True,
        )
    print(
        f"# weak scaling: {[(nd, f'{dt*1e3:.2f}ms', f'{eff:.2f}') for nd, dt, eff in results]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
