"""Distributed CholeskyQR2 orthonormalization."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_amg.ops.qr import cholesky_qr, orthonormalize
from tpu_amg.parallel import make_solver_mesh
from tpu_amg.parallel.dist import shard_vector


class TestCholeskyQR:
    def test_orthonormal_unsharded(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(200, 8)))
        q = cholesky_qr(x)
        np.testing.assert_allclose(
            np.asarray(q.T @ q), np.eye(8), atol=1e-10
        )
        # same column space: projections match
        qr_q, _ = np.linalg.qr(np.asarray(x))
        proj = qr_q.T @ np.asarray(q)
        np.testing.assert_allclose(np.abs(np.linalg.det(proj)), 1.0, atol=1e-8)

    def test_sharded_matches_unsharded_span(self):
        mesh = make_solver_mesh(8)
        ctx = jax.set_mesh(mesh)  # exit below: don't leak into other modules
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(256, 4)))
        xs = shard_vector(x, mesh)
        q_sh = jax.jit(orthonormalize)(xs)
        q_sh = np.asarray(q_sh)
        np.testing.assert_allclose(q_sh.T @ q_sh, np.eye(4), atol=1e-9)
        q_ref, _ = np.linalg.qr(np.asarray(x))
        # spans agree
        np.testing.assert_allclose(
            np.abs(np.linalg.svd(q_ref.T @ q_sh, compute_uv=False)),
            np.ones(4),
            atol=1e-8,
        )
        ctx.__exit__(None, None, None)

    def test_ill_conditioned_still_orthonormal(self):
        rng = np.random.default_rng(2)
        base = rng.normal(size=(100, 4))
        base[:, 3] = base[:, 0] + 1e-6 * rng.normal(size=100)  # near-dependent
        q = cholesky_qr(jnp.asarray(base))
        np.testing.assert_allclose(
            np.asarray(q.T @ q), np.eye(4), atol=1e-6
        )
