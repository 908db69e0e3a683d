"""Surface mass operator, centers of mass, rigid-body modes and the
L2-projected normal vector (reference `compute_center_of_mass_and_rigid_modes`
`source/bem_stokes.cc:2441-2788` and `compute_normal_vector` `:3923-4011`).

The consistent mass matrix is never materialized: it acts as a
gather-contract-scatter operator over cells (same scalar mass on each of the
dim components), which is all the framework needs (duals N_dual = M N, normal
projection solve, l2 norms).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.geometry import panel_geometry


@dataclasses.dataclass(frozen=True)
class MassOperator:
    """Scalar consistent-mass operator tables for one space/quadrature."""

    n_nodes: int
    cells_nodes: np.ndarray  # [Nc, nl]
    phi: np.ndarray  # [nq, nl]
    jxw: jnp.ndarray  # [Nc, nq] (depends on euler; rebuilt per frame)

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        """v [n, d] or [n] -> M v, componentwise."""
        squeeze = v.ndim == 1
        if squeeze:
            v = v[:, None]
        cells = jnp.asarray(self.cells_nodes)
        phi = jnp.asarray(self.phi, v.dtype)
        vq = jnp.einsum("ql,clD->cqD", phi, v[cells])
        rc = jnp.einsum("ql,cqD,cq->clD", phi, vq, self.jxw)
        out = jnp.zeros_like(v).at[cells.reshape(-1)].add(
            rc.reshape(-1, v.shape[1])
        )
        return out[:, 0] if squeeze else out

    def lumped(self) -> jnp.ndarray:
        """Row-sum lumped mass [n]."""
        cells = jnp.asarray(self.cells_nodes)
        # pin to the geometry dtype: an unconverted f64 numpy table here
        # silently promoted the whole normal solve (and through the V
        # null-space correction the V operator itself) to f64 on f32 runs
        phi = jnp.asarray(self.phi, self.jxw.dtype)
        rl = jnp.einsum("ql,cq->cl", phi, self.jxw)
        return jnp.zeros((self.n_nodes,), rl.dtype).at[cells.reshape(-1)].add(
            rl.reshape(-1)
        )


def build_mass_operator(euler, tables) -> tuple[MassOperator, tuple]:
    """Build the mass operator and smooth panel geometry for the current
    euler vector; `tables` is an AssemblyTables (reuses its smooth rule)."""
    cfg = tables.cfg
    dt = cfg.dtype
    xq, normals, jxw = panel_geometry(
        euler[jnp.asarray(tables.cells_nodes_map)].astype(dt),
        jnp.asarray(tables.phi_map, dt),
        jnp.asarray(tables.dphi_map, dt),
        jnp.asarray(tables.q_weights, dt),
        jnp.asarray(tables.flip_sign, dt),
        ambient_dim=cfg.dim,
    )
    op = MassOperator(
        n_nodes=tables.n_nodes,
        cells_nodes=tables.cells_nodes_fe,
        phi=tables.phi_fe,
        jxw=jxw,
    )
    return op, (xq, normals, jxw)


def surface_mass_and_com(xq, jxw, cell_mask=None):
    """Total surface measure and center of mass; cell_mask [Nc] restricts to a
    material subset (the reference's body-only CoM, `:2492-2498`)."""
    w = jxw if cell_mask is None else jxw * cell_mask[:, None]
    mass = jnp.sum(w)
    com = jnp.einsum("cq,cqd->d", w, xq) / mass
    return mass, com


def rigid_modes(support_pts, pole, node_mask=None):
    """N_rigid [R, n, d] with R = 2d-3 rotations + d translations ordered
    (translations, rotations), restricted to `node_mask` nodes (the swimmer
    body; reference N_rigid vs N_rigid_complete).

    3D: 6 modes; 2D: 3 modes (2 translations + 1 rotation)."""
    n, d = support_pts.shape
    r = support_pts - pole[None, :]
    modes = []
    for a in range(d):
        e = jnp.zeros((n, d), support_pts.dtype).at[:, a].set(1.0)
        modes.append(e)
    if d == 3:
        for a in range(3):
            omega = jnp.zeros((3,), support_pts.dtype).at[a].set(1.0)
            modes.append(jnp.cross(jnp.broadcast_to(omega, (n, 3)), r))
    else:
        modes.append(jnp.stack([-r[:, 1], r[:, 0]], axis=-1))
    N = jnp.stack(modes)  # [R, n, d]
    if node_mask is not None:
        N = N * node_mask[None, :, None]
    return N


def _cg(matvec, b, x0, tol=1e-12, maxiter=500, precond=None):
    """Jitted preconditioned CG on flat arrays."""
    if precond is None:
        precond = lambda r: r

    r0 = b - matvec(x0)
    z0 = precond(r0)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, k + 1

    def cond(state):
        _, r, _, _, _, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > tol, k < maxiter)

    x, r, *_ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, jnp.vdot(r0, z0), 0)
    )
    return x


def normal_vector_l2(mass_op: MassOperator, normals_q, jxw, body_node_mask):
    """L2 projection of the outward panel normal onto the FE space, node-wise
    normalization, and the body-only copy + duals (reference
    `compute_normal_vector`, `:3923-4011`).

    Returns dict with normal [n, d], normal_pure [n, d], M_normal,
    M_normal_pure, l2_gamma, l2_gamma_pure.
    """
    cells = jnp.asarray(mass_op.cells_nodes)
    phi = jnp.asarray(mass_op.phi, jxw.dtype)
    n, d = mass_op.n_nodes, normals_q.shape[-1]
    rhs_c = jnp.einsum("ql,cqd,cq->cld", phi, normals_q, jxw)
    rhs = jnp.zeros((n, d), jxw.dtype).at[cells.reshape(-1)].add(
        rhs_c.reshape(-1, d)
    )
    # mass solve with Jacobi (lumped-mass) preconditioning, componentwise
    diag = mass_op.lumped()

    def mv(vf):
        return mass_op.matvec(vf.reshape(n, d)).reshape(-1)

    precond = lambda r: (r.reshape(n, d) / diag[:, None]).reshape(-1)
    x0 = precond(rhs.reshape(-1))
    sol = _cg(mv, rhs.reshape(-1), x0, precond=precond).reshape(n, d)
    norm = jnp.linalg.norm(sol, axis=-1, keepdims=True)
    normal = sol / jnp.where(norm == 0, 1.0, norm)
    normal_pure = normal * body_node_mask[:, None]
    M_normal = mass_op.matvec(normal)
    M_normal_pure = mass_op.matvec(normal_pure)
    return dict(
        normal=normal,
        normal_pure=normal_pure,
        M_normal=M_normal,
        M_normal_pure=M_normal_pure,
        l2_gamma=jnp.sum(M_normal * normal),
        l2_gamma_pure=jnp.sum(M_normal_pure * normal_pure),
    )


def flatten(v):
    """[n, d] -> component-blocked flat [d*n] (reference layout i + c*n)."""
    return v.T.reshape(-1)


def unflatten(vf, d):
    """flat [d*n] -> [n, d]."""
    return vf.reshape(d, -1).T
