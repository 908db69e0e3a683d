"""Monolithic saddle system coupling the BIE blocks to the rigid-body
balance rows (reference `source/bem_stokes.cc:3152-3360`).

Instead of the reference's element-wise copy of V / -K columns into a third
matrix, the system is built with one vectorized select over a per-column
operator mask, and can also act as an implicit operator (matvec without ever
materializing A) for preconditioned GMRES:

    A x = [ V . (m_V x_s) - K . (m_K x_s) - scale * tmp_N^T u ;
            rows(N_dual) x_s  (or identity rows for ImposedVelocity) ]

Column selection per BC set (columns = unknowns at that node):
  body / no-slip wall / dirichlet wall  -> V (traction unknown)
  neumann wall                          -> -K (velocity unknown)
  free-surface wall: wall-normal component -> V, tangential -> -K
  do-nothing wall:   wall-normal component -> -K, tangential -> V
(reference `:3196-3243`; the component split tests |n_j| ~ 1 against the
projected FE normal, `:3210-3212`.)
"""

from __future__ import annotations

import jax.numpy as jnp

GRID_REAL = "Real"
GRID_IMPOSED_FORCE = "ImposedForce"
GRID_IMPOSED_VELOCITY = "ImposedVelocity"
GRID_CONVERGENCE = "Convergence"


def operator_column_mask(
    bc_material_per_node: jnp.ndarray,  # [n] material id of each scalar node
    normal_flat: jnp.ndarray,  # [d*n] projected FE normal
    n_nodes: int,
    dim: int,
) -> jnp.ndarray:
    """Boolean mask over flat columns: True -> V column, False -> -K column."""
    from ..mesh.surface_mesh import (
        MATERIAL_BODY,
        MATERIAL_WALL_NO_SLIP,
        MATERIAL_WALL_FREE_SURFACE,
        MATERIAL_WALL_DO_NOTHING,
        MATERIAL_WALL_DIRICHLET,
        MATERIAL_WALL_NEUMANN,
    )

    mat = jnp.tile(bc_material_per_node, dim)  # [d*n]
    is_normal_comp = jnp.abs(jnp.abs(normal_flat) - 1.0) < 5e-2
    sel_V = (
        (mat == MATERIAL_BODY)
        | (mat == MATERIAL_WALL_NO_SLIP)
        | (mat == MATERIAL_WALL_DIRICHLET)
        | ((mat == MATERIAL_WALL_FREE_SURFACE) & is_normal_comp)
        | ((mat == MATERIAL_WALL_DO_NOTHING) & ~is_normal_comp)
    )
    return sel_V


def imposed_tail_vector(
    num_rigid: int,
    dim: int,
    imposed_component: int,
    angle: float = 0.0,
    rotate: bool = False,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Rhs tail [R] for ImposedForce / ImposedVelocity / Convergence runs: a
    unit vector at `imposed_component`, optionally rotated about the x-axis
    by `angle_for_imposed_stuff` and placed in the translation block (when
    imposed_component < dim) or the rotation block (reference
    `source/bem_stokes.cc:3277-3311`, Rodrigues rotation `:846-875`).

    NOTE (parity quirk): the reference applies the rotation only when
    `dim == 3 && extra_debug_info == true` (`:3286-3293`); callers pass that
    gate as `rotate`."""
    import numpy as np

    e = np.zeros(dim)
    e[imposed_component % dim] = 1.0
    if rotate and dim == 3 and angle != 0.0:
        c, s = np.cos(angle), np.sin(angle)
        Rx = np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
        e = Rx @ e
    tail = np.zeros(num_rigid)
    if imposed_component < dim:
        tail[:dim] = e
    else:
        tail[dim:num_rigid] = e[: num_rigid - dim]
    return jnp.asarray(tail, dtype)


def build_monolithic_system(
    V: jnp.ndarray,  # [d*n, d*n]
    K: jnp.ndarray,  # [d*n, d*n]
    sel_V: jnp.ndarray,  # [d*n] bool column mask
    tmp_N: jnp.ndarray,  # [R, d*n] projected rigid columns P_t K P_t N_r
    N_dual: jnp.ndarray,  # [R, d*n] M-duals of the rigid modes
    rhs_surface: jnp.ndarray,  # [d*n] P_t K P_t s_dot (zero if grid != Real)
    grid_type: str = GRID_REAL,
    imposed_component: int = 0,
    assemble_scaling: float = 1.0,
    tmp_torque: jnp.ndarray | None = None,  # [d*n] P_t K P_t N_flag_torque
    torque_dual: jnp.ndarray | None = None,  # [d*n] M N_flagellum_torque
    imposed_motor_torque: float = -2.0,
    imposed_tail: jnp.ndarray | None = None,  # [R] rhs tail override
):
    """Materialize A [d*n+R(+1), d*n+R(+1)] and rhs (for the LU/direct path
    and as the preconditioner matrix).

    With `tmp_torque`/`torque_dual` the system gains the motor-torque
    unknown: the flagellum rotation rate omega becomes an extra column
    (-scale * tmp_torque on the surface rows) and the imposed motor torque an
    extra balance row (scale * torque_dual^T f = imposed_motor_torque), with
    a zero surface rhs — reference `solve_with_torque`,
    `source/bem_stokes.cc:3191-3192, 3252-3256, 3340-3356`."""
    dn = V.shape[0]
    R = tmp_N.shape[0]
    dt = V.dtype
    with_torque = tmp_torque is not None

    top_left = jnp.where(sel_V[None, :], V, -K)
    top_right = -assemble_scaling * tmp_N.T  # [dn, R]

    if grid_type == GRID_IMPOSED_VELOCITY:
        bottom_left = jnp.zeros((R, dn), dt)
        bottom_right = assemble_scaling * jnp.eye(R, dtype=dt)
    elif grid_type == GRID_REAL:
        bottom_left = assemble_scaling * N_dual
        bottom_right = jnp.zeros((R, R), dt)
    else:  # ImposedForce / Convergence: momentum rows, unscaled
        bottom_left = N_dual
        bottom_right = jnp.zeros((R, R), dt)

    rhs_tail = jnp.zeros((R,), dt)
    if grid_type != GRID_REAL:
        rhs_head = jnp.zeros((dn,), dt)
        if imposed_tail is not None:
            rhs_tail = imposed_tail.astype(dt)
        else:
            rhs_tail = rhs_tail.at[imposed_component].set(1.0)
    else:
        rhs_head = rhs_surface

    if not with_torque:
        A = jnp.block([[top_left, top_right], [bottom_left, bottom_right]])
        rhs = jnp.concatenate([rhs_head, rhs_tail])
        return A, rhs

    torque_col_top = -assemble_scaling * tmp_torque[:, None]  # [dn, 1]
    torque_col_mid = jnp.zeros((R, 1), dt)
    torque_row = jnp.concatenate(
        [
            assemble_scaling * torque_dual[None, :],
            jnp.zeros((1, R + 1), dt),
        ],
        axis=1,
    )  # [1, dn+R+1]
    A = jnp.block(
        [
            [top_left, top_right, torque_col_top],
            [bottom_left, bottom_right, torque_col_mid],
        ]
    )
    A = jnp.concatenate([A, torque_row], axis=0)
    # the gait is the unknown: zero surface rhs (reference `:3191-3192`)
    rhs = jnp.concatenate(
        [
            jnp.zeros((dn,), dt),
            rhs_tail,
            jnp.full((1,), imposed_motor_torque, dt),
        ]
    )
    return A, rhs


def split_monolithic_solution(
    x: jnp.ndarray, sel_V: jnp.ndarray, n_rigid: int, assemble_scaling: float = 1.0
):
    """Split the monolithic solution into (stokes_forces, wall_velocities,
    rigid_velocities) — the diagonal-operator test of the reference
    (`source/bem_stokes.cc:4351-4414`) reduces to the column mask, and the
    rigid tail is un-scaled (`:4457-4462`)."""
    dn = x.shape[0] - n_rigid
    surf = x[:dn]
    forces = jnp.where(sel_V, surf, 0.0)
    wall_vel = jnp.where(sel_V, 0.0, surf)
    rigid = x[dn:] * assemble_scaling
    return forces, wall_vel, rigid
