"""Sharding-aware primitive helpers.

JAX's sharding-in-types cannot infer output shardings for contractions
over sharded dims (``jnp.vdot`` → dot_general), but elementwise-multiply
+ ``jnp.sum`` reduces cleanly (the reduction over the sharded axis
auto-inserts a psum over ICI and yields a replicated scalar).  All
vectors in this library are real, so the inner products below are exact
replacements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Real inner product, safe for row-sharded inputs."""
    return jnp.sum(a * b)


def snorm(a: jax.Array) -> jax.Array:
    """2-norm via sdot (safe for sharded vectors/matrices)."""
    return jnp.sqrt(jnp.sum(a * a))
