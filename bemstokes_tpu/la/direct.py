"""Dense LU direct solver / stale-LU preconditioner.

The reference's DirectPreconditioner wraps a Trilinos Amesos LU: factor the
monolithic matrix once, apply the (possibly stale) factorization as a
preconditioner on later frames, and refactor when GMRES iteration counts blow
past a trigger (reference `include/direct_preconditioner.h:25-27`,
`source/bem_stokes.cc:4336-4339, 5768-5779`).

On TPU the factorization is jax.scipy's blocked LU (MXU-friendly); the
sharded multi-host variant lives in `bemstokes_tpu.parallel`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.jit
def lu_factor_dense(A: jnp.ndarray):
    return jax.scipy.linalg.lu_factor(A)


@jax.jit
def lu_solve_dense(factors, b: jnp.ndarray):
    return jax.scipy.linalg.lu_solve(factors, b)


@dataclasses.dataclass
class LUPreconditioner:
    """Stateful stale-LU preconditioner with the reference's refactor-on-
    iteration-count semantics."""

    refactor_iteration_trigger: int = 100
    _factors: tuple | None = None

    def set_up(self, A: jnp.ndarray):
        self._factors = lu_factor_dense(A)

    @property
    def initialized(self) -> bool:
        return self._factors is not None

    def apply(self, v: jnp.ndarray) -> jnp.ndarray:
        if self._factors is None:
            raise RuntimeError("LUPreconditioner not initialized")
        return lu_solve_dense(self._factors, v)

    def maybe_refactor(self, A: jnp.ndarray, last_iterations: int) -> bool:
        """Refactor if the last solve needed too many iterations. Returns
        whether a refactorization happened."""
        if (
            self._factors is None
            or last_iterations > self.refactor_iteration_trigger
        ):
            self.set_up(A)
            return True
        return False
