"""Dirichlet-to-Neumann operator and the non-monolithic (grand resistance
matrix) solve strategy (reference `dirichlet_to_neumann_operator`
`source/bem_stokes.cc:4073-4129` and `solve_system(monolithic=false)`
`:4163-4261`).

D2N: f = P_t V^-1 P_t K P_t v, with P_t the body tangential projector
removing the hydrostatic pressure mode.  The resistance strategy computes

    R_rs = N_dual_r . D2N(N_s)        (R x R grand resistance matrix)
    rhs_r = -N_dual_r . D2N(s_dot)  (+ imposed force/velocity rows)

solves the tiny R x R system for the rigid velocity, and reconstructs the
tractions f = D2N(s_dot) + sum_r U_r D2N(N_r).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .corrections import tangential_projector
from ..la.gmres import gmres
from ..la.direct import lu_factor_dense, lu_solve_dense


def dirichlet_to_neumann(
    V: jnp.ndarray,
    K: jnp.ndarray,
    v_flat: jnp.ndarray,
    normal_pure_flat: jnp.ndarray,
    M_normal_pure_flat: jnp.ndarray,
    l2_gamma_pure,
    V_lu=None,
    gmres_opts: dict | None = None,
):
    """f = P_t V^-1 P_t K P_t v.  With V_lu (precomputed LU factors of V) the
    inner solve is direct; otherwise GMRES preconditioned by nothing."""

    def P_t(x):
        return tangential_projector(
            x, normal_pure_flat, M_normal_pure_flat, l2_gamma_pure
        )

    rhs = P_t(K @ P_t(v_flat))
    if V_lu is not None:
        f = lu_solve_dense(V_lu, rhs)
    else:
        opts = dict(restart=100, tol=1e-10, max_restarts=4)
        opts.update(gmres_opts or {})
        f, _ = gmres(lambda x: V @ x, rhs, **opts)
    return P_t(f)


def solve_resistance_system(
    V: jnp.ndarray,
    K: jnp.ndarray,
    shape_velocities_flat: jnp.ndarray,
    N_flat: jnp.ndarray,  # [R, d*n] rigid modes
    N_dual_flat: jnp.ndarray,  # [R, d*n]
    normal_pure_flat: jnp.ndarray,
    M_normal_pure_flat: jnp.ndarray,
    l2_gamma_pure,
    grid_type: str = "Real",
    imposed_component: int = 0,
):
    """Non-monolithic solve.  Returns (rigid_velocities [R], stokes_forces
    [d*n], resistance_matrix [R, R])."""
    R = N_flat.shape[0]
    V_lu = lu_factor_dense(V)

    def d2n(v):
        return dirichlet_to_neumann(
            V,
            K,
            v,
            normal_pure_flat,
            M_normal_pure_flat,
            l2_gamma_pure,
            V_lu=V_lu,
        )

    f_s = d2n(shape_velocities_flat)
    DN_N = jax.vmap(d2n)(N_flat)  # [R, d*n]
    res_matrix = N_dual_flat @ DN_N.T  # R_rs = N_dual_r . D2N(N_s)
    rhs = -(N_dual_flat @ f_s)

    if grid_type == "ImposedForce":
        rhs = rhs.at[imposed_component].add(1.0)
        A = res_matrix
    elif grid_type == "ImposedVelocity":
        A = jnp.eye(R, dtype=V.dtype)
        rhs = jnp.zeros((R,), V.dtype).at[imposed_component].set(1.0)
    else:
        A = res_matrix

    U = jnp.linalg.solve(A, rhs)
    forces = f_s + U @ DN_N
    return U, forces, res_matrix
