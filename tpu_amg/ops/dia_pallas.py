"""Pallas TPU kernel for DIA SpMV.

One single-pass kernel: the padded x vector stays resident in VMEM
across the whole grid (it is the same unblocked buffer every step, so
the pipeline fetches it once), each grid step streams one column-tile of
the (n_diags, n) value array from HBM and accumulates

    y[tile] = Σ_d data[d, tile] ⊙ xp[tile + lo + offset_d]

on the VPU.  The shifted reads are unaligned lane slices of the VMEM
buffer — cheap register rotates instead of HBM gathers.  Traffic is
exactly values + x + y: the SpMV roofline.

Falls back to the XLA slice implementation when x does not fit in VMEM
(n ≳ 3M f32) or on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 8 * 1024
VMEM_X_LIMIT = 3_000_000  # max padded-x elements kept fully in VMEM


LANES = 128


def _kernel(xp_ref, data_ref, y_ref, *, offsets, lo, tile):
    """Aligned-slab loads + static lane rotates.

    Mosaic cannot issue dynamically-unaligned vector loads, so each
    diagonal's shifted read is decomposed into a 128-aligned slab of
    tile+128 lanes plus a *static* lane rotate (offsets are
    trace-time constants): slab[r : r+tile] == xp[base+off : base+off+tile]
    where r = (lo + off) % 128 and the slab starts at the aligned
    base + off - r.
    """
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    acc = None
    for d, off in enumerate(offsets):
        shifted = lo + off
        aligned = (shifted // LANES) * LANES
        r = shifted - aligned
        slab = xp_ref[0:1, pl.ds(i * tile + aligned, tile + LANES)]
        if r:
            # left-shift by r == right-roll by (len - r); pltpu.roll
            # requires a non-negative shift
            slab = pltpu.roll(slab, np.int32(tile + LANES - r), 1)
        term = data_ref[d : d + 1, :] * slab[0:1, :tile]
        acc = term if acc is None else acc + term
    y_ref[0:1, :] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "lo", "interpret")
)
def _dia_spmv_call(data, xp, offsets, n, lo, interpret=False):
    n_diags = data.shape[0]
    num_tiles = n // TILE
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_diags, TILE),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(_kernel, offsets=offsets, lo=lo, tile=TILE)
    # x64 must be off while tracing: Mosaic has no 64-bit types, and the
    # globally-enabled x64 mode turns python-int block indices in the
    # BlockSpec index maps into i64 constants (kernel then fails to
    # legalize on hardware; interpret mode masked this in round 1).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, n), data.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * n_diags * n,
                bytes_accessed=data.size * data.dtype.itemsize
                + xp.size * xp.dtype.itemsize
                + n * data.dtype.itemsize,
                transcendentals=0,
            ),
        )(xp, data)
    return out[0]


def dia_spmv_pallas(dia, x, interpret=None):
    """y = A @ x via the Pallas kernel; raises on unsupported configs
    (caller falls back to the XLA path)."""
    n = dia.nrows
    lo, hi = dia._pad
    if n % TILE != 0:
        raise ValueError("n must be a multiple of the kernel tile")
    if n + lo + hi > VMEM_X_LIMIT:
        raise ValueError("x too large for VMEM-resident kernel")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    # right pad includes one extra lane-group for the aligned slab reads
    xp = jnp.pad(x, (lo, hi + LANES)).reshape(1, -1)
    return _dia_spmv_call(
        dia.data, xp, tuple(dia.offsets), n, lo, interpret=interpret
    )
