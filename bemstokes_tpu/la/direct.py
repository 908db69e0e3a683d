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
    iteration-count semantics.

    `factor_dtype` supports the TPU mixed-precision path: factor in float32
    (the only dtype with a native TPU LuDecomposition) and apply casts, while
    GMRES iterates in float64 — a stale approximate factorization is a
    preconditioner either way, and f64 GMRES restores full accuracy."""

    refactor_iteration_trigger: int = 100
    factor_dtype: jnp.dtype | None = None
    _factors: tuple | None = None

    def set_up(self, A: jnp.ndarray):
        if self.factor_dtype is not None:
            A = A.astype(self.factor_dtype)
        self._factors = lu_factor_dense(A)

    @property
    def initialized(self) -> bool:
        return self._factors is not None

    def apply(self, v: jnp.ndarray) -> jnp.ndarray:
        if self._factors is None:
            raise RuntimeError("LUPreconditioner not initialized")
        fdt = self._factors[0].dtype
        if v.dtype != fdt:
            return lu_solve_dense(self._factors, v.astype(fdt)).astype(v.dtype)
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
