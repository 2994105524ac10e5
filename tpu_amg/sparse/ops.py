"""Host-side sparse algebra: SpGEMM, Galerkin RAP, add, transpose.

The reference gets SpGEMM (``A * P``), transpose, and sparse addition from
faer (reference interpolation/mod.rs:720, 824-828, 945).  These are
setup-time operations — run once per hierarchy build, amortized over many
solves — so they live on the host.  The default backend is scipy.sparse's
C implementation; :mod:`tpu_amg.ops.native` provides a from-scratch C++
SpGEMM used when built (see that module).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tpu_amg.sparse.csr import CSR


def from_coo(rows, cols, vals, shape: Tuple[int, int], block_size: int = 1) -> CSR:
    return CSR.from_coo(rows, cols, vals, shape, block_size)


def eye_csr(n: int, value: float = 1.0) -> CSR:
    idx = np.arange(n)
    return CSR.from_coo(idx, idx, np.full(n, value), (n, n))


def diags_csr(diag) -> CSR:
    diag = np.asarray(diag, dtype=np.float64)
    n = len(diag)
    idx = np.arange(n)
    return CSR.from_coo(idx, idx, diag, (n, n))


def _native():
    try:
        from tpu_amg.ops import native

        return native if native.available() else None
    except Exception:
        return None


def spgemm(a: CSR, b: CSR) -> CSR:
    """C = A @ B (sparse-sparse). Equivalent of faer ``operator*``."""
    if a.ncols != b.nrows:
        raise ValueError(f"spgemm shape mismatch {a.shape} @ {b.shape}")
    nat = _native()
    if nat is not None:
        return nat.spgemm(a, b)
    c = a.to_scipy() @ b.to_scipy()
    c.sum_duplicates()
    c.sort_indices()
    out = CSR.from_scipy(c)
    return out


def sp_add(a: CSR, b: CSR, alpha: float = 1.0, beta: float = 1.0) -> CSR:
    """C = alpha*A + beta*B (faer ``add_assign`` analog)."""
    if a.shape != b.shape:
        raise ValueError(f"sp_add shape mismatch {a.shape} vs {b.shape}")
    rows_a, cols_a, vals_a = a.coo()
    rows_b, cols_b, vals_b = b.coo()
    return CSR.from_coo(
        np.concatenate([rows_a, rows_b]),
        np.concatenate([cols_a, cols_b]),
        np.concatenate([alpha * vals_a, beta * vals_b]),
        a.shape,
        a.block_size,
    )


def sp_transpose(a: CSR) -> CSR:
    return a.transpose()


def rap(a: CSR, p: CSR, r: CSR = None) -> CSR:
    """Galerkin triple product A_c = R (A P), with R = Pᵀ by default.

    Reference interpolation/mod.rs:824-828 (SA) and :711-727 (classical).
    """
    if r is None:
        r = p.transpose()
    ap = spgemm(a, p)
    return spgemm(r, ap)
