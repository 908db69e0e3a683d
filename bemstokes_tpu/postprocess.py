"""Post-processing: off/on-boundary BIE field evaluation, finite-difference
velocity gradients and Cauchy-stress recovery (reference
`evaluate_stokes_bie` `source/bem_stokes.cc:5366-5451`,
`evaluate_stokes_bie_on_boundary` `:5454-5560`,
`approximate_velocity_gradient` `:5332-5364`).

The BIE representation at a point x off the boundary:

    u_i(x) = int_Gamma G_ij(y - x) f_j(y) dGamma
           - int_Gamma W_ijk(y - x) n_k(y) u_j(y) dGamma

vectorized over (evaluation points x quadrature points) in one einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fem.geometry import panel_geometry
from .kernels import (
    stokeslet_G,
    stresslet_W,
    free_surface_G,
    free_surface_W,
    no_slip_wall_G,
    no_slip_wall_W,
    image_point,
)
from .ops.assemble import (
    AssemblyTables,
    KERNEL_FREE_SPACE,
    KERNEL_FREE_SURFACE,
    KERNEL_NO_SLIP,
)
from .physics.rigid import unflatten


def _kernels_at(cfg, x_eval, xq):
    """(G, W) for a batch of evaluation points against all quad points.
    x_eval [P, d]; xq [Nc, nq, d] -> [P, Nc, nq, d, d(,d)]."""
    R = xq[None, :, :, :] - x_eval[:, None, None, :]
    if cfg.kernel == KERNEL_FREE_SPACE:
        return stokeslet_G(R), stresslet_W(R)
    x_img = image_point(x_eval, cfg.wall_axis, cfg.wall_position)
    R_img = xq[None, :, :, :] - x_img[:, None, None, :]
    if cfg.kernel == KERNEL_FREE_SURFACE:
        return (
            free_surface_G(R, R_img, cfg.wall_axis),
            free_surface_W(R, R_img, cfg.wall_axis),
        )
    return (
        no_slip_wall_G(R, R_img, cfg.wall_axis),
        no_slip_wall_W(R, R_img, cfg.wall_axis),
    )


def evaluate_stokes_bie(
    val_points: jnp.ndarray,  # [P, d]
    velocities_flat: jnp.ndarray,  # [d*n] boundary velocity trace
    forces_flat: jnp.ndarray,  # [d*n] boundary traction
    euler: jnp.ndarray,  # [n_map, d]
    tables: AssemblyTables,
) -> jnp.ndarray:
    """u at off-boundary points [P, d]."""
    cfg = tables.cfg
    d = cfg.dim
    dt = cfg.dtype
    val_points = jnp.atleast_2d(val_points).astype(dt)
    cells_map = jnp.asarray(tables.cells_nodes_map)
    cells_fe = jnp.asarray(tables.cells_nodes_fe)

    xq, normals, jxw = panel_geometry(
        euler[cells_map].astype(dt),
        jnp.asarray(tables.phi_map, dt),
        jnp.asarray(tables.dphi_map, dt),
        jnp.asarray(tables.q_weights, dt),
        jnp.asarray(tables.flip_sign, dt),
        ambient_dim=d,
    )
    phi = jnp.asarray(tables.phi_fe, dt)  # [nq, nl]
    f = unflatten(forces_flat.astype(dt), d)[cells_fe]  # [Nc, nl, d]
    u = unflatten(velocities_flat.astype(dt), d)[cells_fe]
    f_q = jnp.einsum("ql,cld->cqd", phi, f)  # [Nc, nq, d]
    u_q = jnp.einsum("ql,cld->cqd", phi, u)

    G, W = _kernels_at(cfg, val_points, xq)  # [P, Nc, nq, d, d(,d)]
    Wn = jnp.einsum("pcqijk,cqk->pcqij", W, normals)
    val = jnp.einsum("pcqij,cqj,cq->pi", G, f_q, jxw) - jnp.einsum(
        "pcqij,cqj,cq->pi", Wn, u_q, jxw
    )
    return val


def evaluate_stokes_bie_on_boundary(
    val_points: jnp.ndarray,
    velocities_flat: jnp.ndarray,
    forces_flat: jnp.ndarray,
    euler: jnp.ndarray,
    support_pts: jnp.ndarray,  # [n, d]
    tables: AssemblyTables,
    match_tol: float = 1e-8,
) -> jnp.ndarray:
    """BIE evaluation at points that may lie ON the boundary: panels whose
    own nodes coincide (within match_tol) with the evaluation point are
    integrated with the per-local-node singular rules instead of the smooth
    rule (reference `:5454-5560`)."""
    cfg = tables.cfg
    d = cfg.dim
    dt = cfg.dtype
    val_points = jnp.atleast_2d(val_points).astype(dt)
    P = val_points.shape[0]
    cells_map = jnp.asarray(tables.cells_nodes_map)
    cells_fe = jnp.asarray(tables.cells_nodes_fe)
    Nc, nl = tables.cells_nodes_fe.shape

    # ---- smooth part with singular panels masked per evaluation point ----
    xq, normals, jxw = panel_geometry(
        euler[cells_map].astype(dt),
        jnp.asarray(tables.phi_map, dt),
        jnp.asarray(tables.dphi_map, dt),
        jnp.asarray(tables.q_weights, dt),
        jnp.asarray(tables.flip_sign, dt),
        ambient_dim=d,
    )
    phi = jnp.asarray(tables.phi_fe, dt)
    f_nodes = unflatten(forces_flat.astype(dt), d)
    u_nodes = unflatten(velocities_flat.astype(dt), d)
    f_q = jnp.einsum("ql,cld->cqd", phi, f_nodes[cells_fe])
    u_q = jnp.einsum("ql,cld->cqd", phi, u_nodes[cells_fe])

    # does evaluation point p coincide with one of panel c's nodes?
    node_xy = support_pts[cells_fe].astype(dt)  # [Nc, nl, d]
    dist2 = jnp.sum(
        (node_xy[None, :, :, :] - val_points[:, None, None, :]) ** 2, axis=-1
    )  # [P, Nc, nl]
    hit = dist2 < match_tol**2  # [P, Nc, nl]
    sing_panel = jnp.any(hit, axis=-1)  # [P, Nc]

    Rsafe = lambda R, m: jnp.where(m[..., None], jnp.ones_like(R), R)
    R = xq[None] - val_points[:, None, None, :]
    R = Rsafe(R, sing_panel[:, :, None])
    if cfg.kernel == KERNEL_FREE_SPACE:
        G, W = stokeslet_G(R), stresslet_W(R)
    else:
        x_img = image_point(val_points, cfg.wall_axis, cfg.wall_position)
        R_img = Rsafe(xq[None] - x_img[:, None, None, :], sing_panel[:, :, None])
        if cfg.kernel == KERNEL_FREE_SURFACE:
            G, W = (
                free_surface_G(R, R_img, cfg.wall_axis),
                free_surface_W(R, R_img, cfg.wall_axis),
            )
        else:
            G, W = (
                no_slip_wall_G(R, R_img, cfg.wall_axis),
                no_slip_wall_W(R, R_img, cfg.wall_axis),
            )
    Wn = jnp.einsum("pcqijk,cqk->pcqij", W, normals)
    w = jxw[None] * (~sing_panel)[:, :, None].astype(dt)
    val = jnp.einsum("pcqij,cqj,pcq->pi", G, f_q, w) - jnp.einsum(
        "pcqij,cqj,pcq->pi", Wn, u_q, w
    )

    # ---- singular panels: per-local-node singular rules ----
    euler_cells = euler[cells_map].astype(dt)
    sphi_map = jnp.asarray(tables.sphi_map, dt)
    sdphi_map = jnp.asarray(tables.sdphi_map, dt)
    sq_w = jnp.asarray(tables.sq_weights, dt)
    sphi_fe = jnp.asarray(tables.sphi_fe, dt)
    xq_s = jnp.einsum("lqm,cmd->clqd", sphi_map, euler_cells)  # [Nc, nl, qs, d]
    J = jnp.einsum("lqmk,cmd->clqdk", sdphi_map, euler_cells)
    nrm = jnp.cross(J[..., 0], J[..., 1])
    jac = jnp.linalg.norm(nrm, axis=-1)
    flip = jnp.asarray(tables.flip_sign, dt)[:, None, None]
    normals_s = nrm / jac[..., None] * flip[..., None]
    jxw_s = jac * sq_w[None, :, :]
    f_qs = jnp.einsum("lqm,cmd->clqd", sphi_fe, f_nodes[cells_fe])
    u_qs = jnp.einsum("lqm,cmd->clqd", sphi_fe, u_nodes[cells_fe])

    def one_point(p_idx):
        # weight per (c, l): 1 where this point hits node l of panel c
        wsel = hit[p_idx].astype(dt)  # [Nc, nl]
        x = val_points[p_idx]
        Rs = xq_s - x[None, None, None, :]
        wz = (jxw_s == 0) | (jnp.sum(Rs * Rs, -1) < 1e-28)
        Rs = jnp.where(wz[..., None], jnp.ones_like(Rs), Rs)
        if cfg.kernel == KERNEL_FREE_SPACE:
            Gs, Ws = stokeslet_G(Rs), stresslet_W(Rs)
        else:
            xi = image_point(x, cfg.wall_axis, cfg.wall_position)
            Rsi = jnp.where(
                wz[..., None], jnp.ones_like(Rs), xq_s - xi[None, None, None, :]
            )
            if cfg.kernel == KERNEL_FREE_SURFACE:
                Gs, Ws = (
                    free_surface_G(Rs, Rsi, cfg.wall_axis),
                    free_surface_W(Rs, Rsi, cfg.wall_axis),
                )
            else:
                Gs, Ws = (
                    no_slip_wall_G(Rs, Rsi, cfg.wall_axis),
                    no_slip_wall_W(Rs, Rsi, cfg.wall_axis),
                )
        Wns = jnp.einsum("clqijk,clqk->clqij", Ws, normals_s)
        w_eff = jxw_s * wsel[:, :, None]
        return jnp.einsum("clqij,clqj,clq->i", Gs, f_qs, w_eff) - jnp.einsum(
            "clqij,clqj,clq->i", Wns, u_qs, w_eff
        )

    val_s = jax.lax.map(one_point, jnp.arange(P))
    return val + val_s


def approximate_velocity_gradient(
    val_points: jnp.ndarray,  # [P, d]
    velocities_flat: jnp.ndarray,
    forces_flat: jnp.ndarray,
    euler: jnp.ndarray,
    tables: AssemblyTables,
    h: float = 1e-5,
) -> jnp.ndarray:
    """Central-difference velocity gradient at off-boundary points
    [P, d, d] with grad[i][j][k] = du_j/dx_k (reference `:5332-5364`; note
    the reference divides the central difference by h, i.e. uses a one-sided
    normalization — we use the standard 2h)."""
    d = val_points.shape[-1]
    P = val_points.shape[0]
    offsets = jnp.concatenate(
        [jnp.eye(d) * h, -jnp.eye(d) * h], axis=0
    )  # [2d, d] (+h rows first)
    pts = (val_points[:, None, :] + offsets[None, :, :]).reshape(-1, d)
    u = evaluate_stokes_bie(pts, velocities_flat, forces_flat, euler, tables)
    u = u.reshape(P, 2 * d, d)
    grad = (u[:, :d, :] - u[:, d:, :]) / (2 * h)  # [P, k, j] = du_j/dx_k
    return grad.transpose(0, 2, 1)  # [P, j, k]


def cauchy_viscous_stress(grad_u: jnp.ndarray, mu: float = 1.0) -> jnp.ndarray:
    """Viscous part of the Cauchy stress 2 mu e(u) from velocity gradients
    [P, d, d] (the pressure part is recovered separately or via the normal
    traction balance)."""
    return mu * (grad_u + jnp.swapaxes(grad_u, -1, -2))


def make_bie_evaluator(tables):
    """Jitted off-boundary evaluator bound to one tables object: traces once
    and reuses the executable across calls (the bare function runs eagerly —
    fine for one-off evaluations, wasteful in loops like the FD stress
    recovery's 2d evaluations per point set)."""
    import jax

    @jax.jit
    def evaluate(val_points, velocities_flat, forces_flat, euler):
        return evaluate_stokes_bie(
            val_points, velocities_flat, forces_flat, euler, tables
        )

    return evaluate


def sharded_evaluate_stokes_bie(
    val_points, velocities_flat, forces_flat, euler, tables, mesh
):
    """Off-boundary BIE evaluation with the POINTS sharded over the device
    mesh (fields replicated) — the distributed counterpart of the
    reference's replicated `evaluate_stokes_bie` (`source/bem_stokes.cc:
    5366-5451`): each device integrates the full boundary against its own
    slice of evaluation points, no collective needed until the caller
    gathers."""
    import jax
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ndev = mesh.devices.size
    P_pts = val_points.shape[0]
    pad = (-P_pts) % ndev
    pts = jnp.pad(val_points, ((0, pad), (0, 0)), constant_values=1e6)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P(), P(), P()),
        out_specs=P("rows"),
        check_vma=False,
    )
    def _ev(pts_loc, u, f, e):
        return evaluate_stokes_bie(pts_loc, u, f, e, tables)

    out = _ev(pts, velocities_flat, forces_flat, euler)
    return out[:P_pts]
