"""Native (C++) host kernels for setup-time sparse algebra.

The reference implements its entire setup path in compiled Rust; here the
hot host-side pieces — two-pass CSR SpGEMM, the greedy-matching pop loop,
the conflict-frozen local-move application, batched BFS neighborhood
expansion — are from-scratch C++ (ops/native_src/amg_native.cc) loaded
via ctypes, with the numpy paths as fallback.  Built by
``python setup_native.py``; auto-built on first import when g++ is
available.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_LIB_PATH = Path(__file__).resolve().parent / "libamg_native.so"

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _try_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        try:
            import setup_native  # repo-root builder

            setup_native.build()
        except Exception:
            try:
                import subprocess
                import sys

                root = Path(__file__).resolve().parents[2]
                subprocess.run(
                    [sys.executable, str(root / "setup_native.py")],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.spgemm_symbolic.restype = ctypes.c_int64
    lib.spgemm_symbolic.argtypes = [
        ctypes.c_int64, _i64p, _i32p, _i64p, _i32p, ctypes.c_int64, _i64p,
    ]
    lib.spgemm_numeric.restype = None
    lib.spgemm_numeric.argtypes = [
        ctypes.c_int64, _i64p, _i32p, _f64p, _i64p, _i32p, _f64p,
        ctypes.c_int64, _i64p, _i32p, _f64p,
    ]
    lib.greedy_match.restype = ctypes.c_int64
    lib.greedy_match.argtypes = [
        ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, _i64p,
    ]
    lib.apply_moves.restype = ctypes.c_int64
    lib.apply_moves.argtypes = [
        ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64,
        _i64p, _i32p, _i64p, _i64p, _i64p,
    ]
    lib.bfs_reach_symbolic.restype = ctypes.c_int64
    lib.bfs_reach_symbolic.argtypes = [
        ctypes.c_int64, _i64p, _i32p, ctypes.c_int64, _i64p,
    ]
    lib.bfs_reach_numeric.restype = None
    lib.bfs_reach_numeric.argtypes = [
        ctypes.c_int64, _i64p, _i32p, ctypes.c_int64, _i64p, _i32p,
    ]
    _u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.strength_filter.restype = None
    lib.strength_filter.argtypes = [
        ctypes.c_int64, _i64p, _f64p, ctypes.c_double, ctypes.c_double,
        _u8p, _f64p,
    ]
    lib.affinity_dist.restype = None
    lib.affinity_dist.argtypes = [
        ctypes.c_int64, _i64p, _i32p, _f64p, _f64p, _f64p, ctypes.c_int64,
        _f64p,
    ]
    lib.best_moves.restype = ctypes.c_int64
    lib.best_moves.argtypes = [
        ctypes.c_int64, _i64p, _i32p, _f64p, _i64p, _i64p, _i64p,
        ctypes.c_double, ctypes.c_double, _i64p, _i64p, _f64p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def spgemm(a, b):
    """C = A @ B on host CSR containers (two-pass native kernel)."""
    from tpu_amg.sparse.csr import CSR

    lib = _try_load()
    assert lib is not None
    n = a.nrows
    indptr_a = np.ascontiguousarray(a.indptr, np.int64)
    indices_a = np.ascontiguousarray(a.indices, np.int32)
    data_a = np.ascontiguousarray(a.data, np.float64)
    indptr_b = np.ascontiguousarray(b.indptr, np.int64)
    indices_b = np.ascontiguousarray(b.indices, np.int32)
    data_b = np.ascontiguousarray(b.data, np.float64)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    nnz = lib.spgemm_symbolic(
        n, indptr_a, indices_a, indptr_b, indices_b, b.ncols, out_indptr
    )
    out_indices = np.zeros(nnz, dtype=np.int32)
    out_data = np.zeros(nnz, dtype=np.float64)
    lib.spgemm_numeric(
        n, indptr_a, indices_a, data_a, indptr_b, indices_b, data_b,
        b.ncols, out_indptr, out_indices, out_data,
    )
    return CSR(
        data=out_data,
        indices=out_indices,
        indptr=out_indptr,
        shape=(a.nrows, b.ncols),
        block_size=a.block_size,
    )


def greedy_match(rows, cols, n_vertices, target):
    """Serial heaviest-first matching; edges pre-sorted descending."""
    lib = _try_load()
    assert lib is not None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    out = np.zeros(2 * min(len(rows), n_vertices // 2 + 1), dtype=np.int64)
    npairs = lib.greedy_match(len(rows), rows, cols, n_vertices, target, out)
    return out[: 2 * npairs].reshape(-1, 2)


def apply_moves(nodes, dest_aggs, indptr, indices, node_weights,
                node_to_agg, agg_sizes):
    """Conflict-frozen move application (mutates node_to_agg/agg_sizes)."""
    lib = _try_load()
    assert lib is not None
    nodes = np.ascontiguousarray(nodes, np.int64)
    dest = np.ascontiguousarray(dest_aggs, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    nw = np.ascontiguousarray(node_weights, np.int64)
    assert node_to_agg.dtype == np.int64 and node_to_agg.flags.c_contiguous
    assert agg_sizes.dtype == np.int64 and agg_sizes.flags.c_contiguous
    return lib.apply_moves(
        len(nodes), nodes, dest, len(node_to_agg), len(agg_sizes),
        indptr, indices, nw, node_to_agg, agg_sizes,
    )


def bfs_reach(indptr, indices, n, max_depth):
    """All-pairs bounded-depth BFS neighborhoods as CSR (excl. center)."""
    lib = _try_load()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    counts = np.zeros(n, dtype=np.int64)
    total = lib.bfs_reach_symbolic(n, indptr, indices, max_depth, counts)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_indptr[1:])
    out_indices = np.zeros(total, dtype=np.int32)
    lib.bfs_reach_numeric(
        n, indptr, indices, max_depth, out_indptr, out_indices
    )
    return out_indptr, out_indices


def affinity_dist(reach_indptr, reach_indices, v, wv, norms):
    """Affinity distances over the reach pattern (threaded single pass;
    replaces the chunked gather+einsum which materialized (chunk, k)
    temporaries per slice)."""
    lib = _try_load()
    assert lib is not None
    reach_indptr = np.ascontiguousarray(reach_indptr, np.int64)
    reach_indices = np.ascontiguousarray(reach_indices, np.int32)
    v = np.ascontiguousarray(v, np.float64)
    wv = np.ascontiguousarray(wv, np.float64)
    norms = np.ascontiguousarray(norms, np.float64)
    dist = np.zeros(len(reach_indices), dtype=np.float64)
    lib.affinity_dist(
        len(reach_indptr) - 1, reach_indptr, reach_indices, v, wv, norms,
        v.shape[1], dist,
    )
    return dist


def strength_filter(indptr, dist, theta, alpha):
    """Per-row keep mask + contrast weights for the strength graph."""
    lib = _try_load()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, np.int64)
    dist = np.ascontiguousarray(dist, np.float64)
    keep = np.zeros(len(dist), dtype=np.uint8)
    weight = np.zeros(len(dist), dtype=np.float64)
    lib.strength_filter(
        len(indptr) - 1, indptr, dist, float(theta), float(alpha), keep, weight
    )
    return keep.astype(bool), weight


def best_moves(indptr, indices, weights, node_to_agg, agg_sizes,
               node_weights, cf, agg_pen):
    """Best positive-gain move per node (one O(E) pass)."""
    lib = _try_load()
    assert lib is not None
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    weights = np.ascontiguousarray(weights, np.float64)
    node_to_agg = np.ascontiguousarray(node_to_agg, np.int64)
    agg_sizes = np.ascontiguousarray(agg_sizes, np.int64)
    node_weights = np.ascontiguousarray(node_weights, np.int64)
    out_nodes = np.zeros(n, dtype=np.int64)
    out_dest = np.zeros(n, dtype=np.int64)
    out_dq = np.zeros(n, dtype=np.float64)
    count = lib.best_moves(
        n, indptr, indices, weights, node_to_agg, agg_sizes, node_weights,
        float(cf), float(agg_pen), out_nodes, out_dest, out_dq,
    )
    return out_nodes[:count], out_dest[:count], out_dq[:count]
