"""Model-problem preset families."""

import jax.numpy as jnp
import numpy as np

from tpu_amg.models import anisotropic_diffusion, elasticity, poisson


def test_poisson_preset_solves():
    mp = poisson(12, dim=2)
    s = mp.setup_solver()
    x, info = s.solve(jnp.asarray(mp.rhs), rtol=1e-8)
    assert bool(info.converged)
    np.testing.assert_allclose(
        mp.matrix.matvec(np.asarray(x)), mp.rhs, atol=1e-6
    )


def test_elasticity_preset_block_size():
    mp = elasticity(3)
    assert mp.matrix.block_size == 3
    assert mp.solver_config.interp_near_null_dim == 6


def test_aniso_preset_metadata():
    mp = anisotropic_diffusion(10, epsilon=1e-2)
    assert mp.name == "aniso2d"
    assert mp.matrix.nrows == 100
    assert mp.solver_config.interp_near_null_dim == 4
