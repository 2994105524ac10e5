"""Native (C++) host kernels for setup-time sparse algebra.

The reference implements its entire setup path in compiled Rust; here the
hot host-side pieces (SpGEMM, greedy matching, strength-graph assembly)
get a from-scratch C++ implementation loaded via ctypes, with the numpy
paths as fallback.  Built by ``python setup_native.py`` (see repo root) or
on first import if a compiler is present.
"""

from __future__ import annotations

_LIB = None


def available() -> bool:
    return _LIB is not None
