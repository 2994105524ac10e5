"""Multiplicative composite preconditioner.

Reference ``Composite`` (composite.rs:48-99): holds the system operator A
and a list of component preconditioners; ``apply`` performs a symmetric
multiplicative sweep — components in reverse order, then forward order
skipping the first (error form E = E₀ᵀ…Eₙᵀ Eₙ…E₁E₀ with
Eᵢ = I − MᵢA) — updating the work residual ws = rhs − A·out after every
component (composite.rs:66-83).

Adaptive AMG (reference adaptivity.rs) enriches the composite by pushing
additional multigrid components; ``push`` returns a new Composite
(immutability — this is a pytree).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

from tpu_amg.linop import LinearOperator


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Composite(LinearOperator):
    a: LinearOperator
    components: Tuple[LinearOperator, ...]

    @property
    def shape(self):
        return self.a.shape

    def push(self, component: LinearOperator) -> "Composite":
        return Composite(a=self.a, components=self.components + (component,))

    def _apply(self, rhs):
        out = jax.numpy.zeros(rhs.shape, dtype=rhs.dtype)
        ws = rhs
        # reversed pass then forward pass skipping the first component
        # (reference composite.rs:69-81)
        order = list(reversed(self.components)) + list(self.components[1:])
        for comp in order:
            out = out + comp(ws)
            ws = rhs - self.a(out)
        return out

    def mv(self, x):
        return self._apply(x)

    def mm(self, xs):
        return self._apply(xs)
