"""RCM reordering: bandwidth reduction + solve equivalence."""

import numpy as np

from tpu_amg.sparse import CSR
from tpu_amg.utils.problems import poisson2d
from tpu_amg.utils.reorder import bandwidth, permute_symmetric, rcm_reorder


def scrambled_poisson(n, seed=0):
    a = poisson2d(n)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(a.nrows)
    return permute_symmetric(a, perm), a


def test_rcm_reduces_bandwidth():
    scrambled, original = scrambled_poisson(16)
    assert bandwidth(scrambled) > bandwidth(original)
    reordered, perm, inv = rcm_reorder(scrambled)
    assert bandwidth(reordered) <= 2 * bandwidth(original)


def test_permutation_is_similarity():
    scrambled, _ = scrambled_poisson(8, seed=1)
    reordered, perm, inv = rcm_reorder(scrambled)
    # spectra agree (similarity transform)
    w1 = np.sort(np.linalg.eigvalsh(scrambled.to_dense()))
    w2 = np.sort(np.linalg.eigvalsh(reordered.to_dense()))
    np.testing.assert_allclose(w1, w2, atol=1e-9)
    # solve equivalence: A x = b  <=>  B y = b[perm], x = y[inv... ]
    rng = np.random.default_rng(2)
    b = rng.normal(size=scrambled.nrows)
    x = np.linalg.solve(scrambled.to_dense(), b)
    y = np.linalg.solve(reordered.to_dense(), b[perm])
    np.testing.assert_allclose(y, x[perm], atol=1e-8)


def test_banded_after_rcm_is_halo_eligible():
    import jax

    from tpu_amg.parallel import HaloELL, make_solver_mesh
    from tpu_amg.sparse import ELL

    scrambled, _ = scrambled_poisson(16, seed=3)
    reordered, _, _ = rcm_reorder(scrambled)
    mesh = make_solver_mesh(8)
    # scrambled ordering violates the band assumption...
    try:
        HaloELL.from_ell(ELL.from_csr(scrambled), mesh)
        scrambled_ok = True
    except ValueError:
        scrambled_ok = False
    assert not scrambled_ok
    # ...RCM restores it
    h = HaloELL.from_ell(ELL.from_csr(reordered), mesh)
    assert h.halo <= 64
