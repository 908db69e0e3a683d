"""Single-chip blocked LU (`la.direct.blocked_lu_factor/_solve`): XLA's
LuDecomposition custom call dies above ~16k rows on a v5e (scoped-VMEM
overflow), so large monolithic systems route through this right-looking
blocked factorization.  Correctness vs numpy, ragged padding, and the
lu_factor_dense/lu_solve_dense auto-dispatch seam."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.la.direct import (
    blocked_lu_factor,
    blocked_lu_solve,
    lu_solve_dense,
    LUPreconditioner,
)


@pytest.mark.parametrize(
    "n,blk", [(300, 128), (512, 128), (700, 256), (1000, 512)]
)
def test_blocked_lu_matches_numpy(n, blk):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n)) + 3.0 * np.eye(n)
    b = rng.standard_normal(n)
    LU, perms = blocked_lu_factor(jnp.asarray(A), block=blk)
    x = blocked_lu_solve(LU, perms, jnp.asarray(b))
    assert np.abs(np.asarray(x) - np.linalg.solve(A, b)).max() < 1e-9


def test_lu_solve_dense_dispatches_on_pivot_rank():
    """lu_solve_dense picks the blocked path when given [nb, B] per-block
    permutations (the factor kind produced above the size threshold)."""
    rng = np.random.default_rng(1)
    n = 260
    A = rng.standard_normal((n, n)) + 3.0 * np.eye(n)
    b = rng.standard_normal(n)
    facs = blocked_lu_factor(jnp.asarray(A), block=128)
    assert facs[1].ndim == 2
    x = lu_solve_dense(facs, jnp.asarray(b))
    assert np.abs(np.asarray(x) - np.linalg.solve(A, b)).max() < 1e-9


def test_blocked_lu_as_gmres_preconditioner():
    """A blocked-LU factorization drives GMRES to 1-iteration convergence
    like the monolithic custom-call LU (preconditioner-quality check)."""
    from bemstokes_tpu.la.gmres import gmres

    rng = np.random.default_rng(2)
    n = 400
    A = jnp.asarray(rng.standard_normal((n, n)) + 5.0 * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    LU, perms = blocked_lu_factor(A, block=128)
    x, info = gmres(
        lambda v: A @ v,
        b,
        precond=lambda v: blocked_lu_solve(LU, perms, v),
        restart=30,
        tol=1e-12,
        max_restarts=3,
    )
    # the stored explicit triangular inverses trade ~1 digit of factor
    # accuracy for GEMV-only applies; a couple of iterations polish it
    assert int(info["iterations"]) <= 3
    assert np.abs(np.asarray(A @ x - b)).max() < 1e-9
