"""Sharded end-to-end frame step: row-partitioned assembly, slab-layout
operator corrections, implicit monolithic matvec, block-Jacobi-LU
preconditioned GMRES — the multi-chip "training step" of the framework.

This is the distributed counterpart of `StokesBEMProblem._pipeline` +
`solve_frame`: same math, with the dense operators living sharded
P('rows', None) on a 1-D device mesh and every correction applied in slab
layout (no device ever holds the full matrix).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .sharded import (
    padded_rows,
    sharded_assemble,
    flat_to_slab,
    slab_to_flat,
)
from ..la.gmres import gmres
from ..ops.monolithic import operator_column_mask
from ..ops.corrections import tangential_projector
from ..physics.rigid import (
    build_mass_operator,
    surface_mass_and_com,
    rigid_modes,
    normal_vector_l2,
    flatten,
)


def slab_rank1_update(A_slab, u_slab, v_rep, mesh: Mesh):
    """A += outer(u, v) with u row-sharded (slab) and v replicated."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows", None), P("rows"), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )
    def _upd(A_loc, u_loc, v):
        return A_loc + jnp.outer(u_loc, v)

    return _upd(A_slab, u_slab, v_rep)


def slab_solid_angle_correction(
    K_slab,
    n_nodes,
    dim,
    mesh: Mesh,
    use_internal_alpha=False,
    component_labels=None,
    component_alpha=None,
    return_check=False,
):
    """Distributed version of ops.corrections.k_solid_angle_correction: each
    device corrects the diagonal blocks of its own rows.  With
    `component_labels`/`component_alpha` the row sums are restricted to each
    node's own connected component (see the single-chip docstring: the
    constant-field identity only holds on closed boundaries).  With
    `return_check` also returns the post-correction versor check [d]
    (max restricted row sum per component, computed from the in-hand row
    blocks — the single-chip diagnostic without extra matvecs)."""
    n = n_nodes
    d = dim
    _, nloc = padded_rows(n, mesh)
    lab = None if component_labels is None else jnp.asarray(component_labels)
    alp = (
        None
        if component_alpha is None
        else jnp.asarray(component_alpha, K_slab.dtype)
    )

    def _corr(K_loc):  # [d*nloc, d*n]
        r0 = jax.lax.axis_index("rows").astype(jnp.int32) * nloc
        i = jnp.arange(nloc, dtype=jnp.int32)
        node = r0 + i  # global node ids of this slab
        valid = node < n
        if lab is None:
            C = jnp.stack(
                [K_loc[:, b * n : (b + 1) * n].sum(axis=1) for b in range(d)],
                axis=-1,
            )  # [d*nloc, d]
            alpha = 1.0
        else:
            row_lab = lab[jnp.clip(node, 0, n - 1)]  # [nloc]
            same = (
                jnp.tile(row_lab, d)[:, None] == lab[None, :]
            )  # [d*nloc, n]
            C = jnp.stack(
                [
                    (K_loc[:, b * n : (b + 1) * n] * same).sum(axis=1)
                    for b in range(d)
                ],
                axis=-1,
            )
            alpha = alp[jnp.clip(node, 0, n - 1)]  # [nloc]
        rows = (
            jnp.arange(d, dtype=jnp.int32)[:, None, None] * nloc + i[None, None, :]
        )  # [d,1,nloc]
        big = jnp.int32(d * nloc + d * n)
        cols = jnp.where(
            valid[None, None, :],
            jnp.arange(d, dtype=jnp.int32)[None, :, None] * n + node[None, None, :],
            big,
        )  # [1,d,nloc]
        rows_b = jnp.broadcast_to(rows, (d, d, nloc))
        cols_b = jnp.broadcast_to(cols, (d, d, nloc))
        Cab = C.reshape(d, nloc, d)  # [a, i, b]
        vals = -Cab.transpose(0, 2, 1) + jnp.eye(d, dtype=K_loc.dtype)[
            :, :, None
        ] * (
            (alpha - 1.0 if use_internal_alpha else alpha)
            if lab is not None
            else (0.0 if use_internal_alpha else 1.0)
        )
        K_new = K_loc.at[rows_b.ravel(), cols_b.ravel()].add(
            vals.ravel(), mode="drop"
        )
        if not return_check:
            return K_new
        # post-correction restricted row sums of the corrected rows
        if lab is None:
            C2 = jnp.stack(
                [K_new[:, b * n : (b + 1) * n].sum(axis=1) for b in range(d)],
                axis=-1,
            )
        else:
            C2 = jnp.stack(
                [
                    (K_new[:, b * n : (b + 1) * n] * same).sum(axis=1)
                    for b in range(d)
                ],
                axis=-1,
            )
        vmask = jnp.tile(valid, d)[:, None]
        check = jax.lax.pmax(
            jnp.max(jnp.abs(jnp.where(vmask, C2, 0.0)), axis=0), "rows"
        )  # [d], replicated
        return K_new, check

    wrapped = shard_map(
        _corr,
        mesh=mesh,
        in_specs=(P("rows", None),),
        out_specs=(P("rows", None), P()) if return_check else P("rows", None),
        check_vma=False,
    )
    return wrapped(K_slab)


def slab_block_jacobi_lu(A_slab, tail_rows, n_nodes, dim, n_rigid, mesh: Mesh):
    """Factor each device's diagonal block (its rows x its columns) for a
    block-Jacobi preconditioner; the rigid tail gets the identity.  Returns
    (lu, piv) stacked over devices, sharded P('rows')."""
    n = n_nodes
    d = dim
    _, nloc = padded_rows(n, mesh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows", None),),
        out_specs=(P("rows", None), P("rows")),
        check_vma=False,
    )
    def _factor(A_loc):  # [d*nloc, d*n]
        r0 = jax.lax.axis_index("rows").astype(jnp.int32) * nloc
        # own columns: for each component b, the slice [b*n + r0, +nloc)
        blocks = [
            jax.lax.dynamic_slice(
                A_loc, (0, b * n), (d * nloc, n)
            )  # component block
            for b in range(d)
        ]
        own = jnp.concatenate(
            [
                jax.lax.dynamic_slice(blk, (jnp.int32(0), r0), (d * nloc, nloc))
                for blk in blocks
            ],
            axis=1,
        )  # [d*nloc, d*nloc]
        # padded rows/cols: put 1 on the diagonal to keep the block regular
        node = r0 + jnp.arange(nloc, dtype=jnp.int32)
        pad = jnp.tile(node >= n, d)
        own = jnp.where(
            (pad[:, None] | pad[None, :]),
            jnp.eye(d * nloc, dtype=A_loc.dtype) * 1.0,
            own,
        )
        lu, piv = jax.scipy.linalg.lu_factor(own)
        return lu, piv

    return _factor(A_slab)


def slab_block_jacobi_apply(lu_slab, piv_slab, v_slab, mesh: Mesh):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows", None), P("rows"), P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )
    def _apply(lu, piv, v):
        return jax.scipy.linalg.lu_solve((lu, piv), v)

    return _apply(lu_slab, piv_slab, v_slab)


def slab_diagonal(A_slab, n_nodes, dim, mesh: Mesh):
    """Each device's diagonal entries of its own rows (slab-ordered,
    sharded P('rows')) — the distributed Jacobi preconditioner."""
    n, d = n_nodes, dim
    _, nloc = padded_rows(n, mesh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows", None),),
        out_specs=P("rows"),
        check_vma=False,
    )
    def _diag(A_loc):  # [d*nloc, d*n]
        r0 = jax.lax.axis_index("rows").astype(jnp.int32) * nloc
        rows = jnp.arange(d * nloc, dtype=jnp.int32)
        a, i = rows // nloc, rows % nloc
        node = r0 + i
        cols = a * n + node
        dg = A_loc[rows, jnp.clip(cols, 0, d * n - 1)]
        return jnp.where(node < n, dg, jnp.ones_like(dg))

    return _diag(A_slab)


def make_sharded_frame_step(problem, dmesh: Mesh, return_fields: bool = False):
    """Build the distributed frame step for a StokesBEMProblem.

    Returns step(euler, sdot_flat) -> (rigid_velocities [R], euler_next,
    info) running: sharded assembly -> slab corrections -> implicit
    monolithic GMRES -> rigid update (translation + rotation of body nodes
    about the force pole).  With `return_fields` the step additionally
    returns a fields dict (forces, wall velocities, rigid modes, normals,
    rigid force sums, per-frame invariant diagnostics) so the swimmer frame
    loop can emit its full output set from the distributed solve
    (SwimmerSimulation with cfg.distributed).

    Config parity with the single-chip path:
    - `solver.gmres_restart` / `solver.max_steps` bound the Arnoldi work
      exactly like `StokesBEMProblem.solve_frame`;
    - `solver.preconditioner_type == "Direct"` uses the DISTRIBUTED stale-LU
      preconditioner (`parallel.lu`): the slab-sharded surface block is
      factored by the blocked LU, the R rigid tail rows/columns are folded
      in exactly via a bordered Schur complement (one distributed LU solve
      per application), and the factors are REUSED across frames with the
      reference's refactor-on-iteration-trigger semantics
      (`source/direct_preconditioner.cc`, trigger `source/bem_stokes.cc:
      4336-4339, 5768-5779`); `solver.preconditioner_dtype == "float32"`
      factors in f32 (the TPU mixed-precision path);
    - `solver.preconditioner_type == "Jacobi"` uses the distributed diagonal;
      every other type maps to block-Jacobi-LU — each device's diagonal
      block is its local dense LU;
    - `time_integration == "Heun"` is provided by `sharded_heun_step`
      (predictor-corrector re-running this step at the midpoint geometry,
      reference `source/bem_stokes.cc:5787-5835`).
    """
    cfg = problem.cfg
    if cfg.solve_with_torque or cfg.imposed_rotation_as_flagellum_shape or (
        cfg.imposed_translation_as_flagellum_shape
    ):
        # the torque row/column and the motor-torque output set
        # (motor_torque.txt, rigid_flagellum VTU field) are single-chip
        # features; refusing beats silently dropping reference outputs
        raise NotImplementedError(
            "flagellum torque/imposed-shape runs are single-chip only; the "
            "distributed step covers the rigid tail but not the torque "
            "row/column or its output set"
        )
    if not cfg.monolithic:
        raise NotImplementedError(
            "the resistance (non-monolithic) strategy is single-chip only; "
            "the distributed step solves the monolithic system"
        )
    if problem.hanging.n:
        raise NotImplementedError(
            "hanging-node constraints are applied on the single-chip "
            "monolithic path only (problem.py apply_hanging_constraints_"
            "monolithic); run locally-refined meshes single-chip"
        )
    tables = problem.tables
    d = problem.dim
    n = problem.n
    R = problem.num_rigid
    dt_num = tables.cfg.dtype
    scale = cfg.assemble_scaling
    import numpy as _np

    # body-node mask in MAP space (walls never move; reference rotates only
    # body DoFs in compute_euler_vector, `source/bem_stokes.cc:2247-2440`)
    map_sp = problem.map_space
    map_body = _np.zeros(map_sp.n_nodes)
    map_body[
        _np.unique(map_sp.cells_nodes[problem.body_cell_mask > 0])
    ] = 1.0
    from ..fem.geometry import support_points as support_points_fn

    def build_system(euler, sdot_flat):
        """Sharded assembly + corrections + implicit monolithic system;
        returns the traced pieces shared by every preconditioner variant."""
        euler = euler.astype(dt_num)
        mass_op, (xq, normals_q, jxw) = build_mass_operator(euler, tables)
        body_nodes = jnp.asarray(problem.body_node_mask, dt_num)
        body_cells = jnp.asarray(problem.body_cell_mask, dt_num)
        mass_body, com_body = surface_mass_and_com(xq, jxw, body_cells)
        pole = problem.force_pole_point(com_body)
        sp = support_points_fn(euler, problem.map_space, problem.fe_space).astype(
            dt_num
        )
        N = rigid_modes(sp, pole, node_mask=body_nodes)
        N_dual = jax.vmap(mass_op.matvec)(N)
        N_dual_c = jax.vmap(mass_op.matvec)(rigid_modes(sp, pole))
        nv = normal_vector_l2(mass_op, normals_q, jxw, body_nodes)
        n_pure_f = flatten(nv["normal_pure"])
        Mn_pure_f = flatten(nv["M_normal_pure"])
        l2g_pure = nv["l2_gamma_pure"]

        # ---- sharded assembly + corrections ----
        V_slab, K_slab = sharded_assemble(euler, sp, tables, dmesh)
        Vn_slab = _slab_mv(V_slab, n_pure_f, dmesh)
        resid_slab = flat_to_slab(n_pure_f, n, d, dmesh) - Vn_slab
        V_slab = slab_rank1_update(
            V_slab, resid_slab, Mn_pure_f / l2g_pure, dmesh
        )
        k_out = slab_solid_angle_correction(
            K_slab,
            n,
            d,
            dmesh,
            use_internal_alpha=cfg.use_internal_alpha,
            component_labels=problem.node_component_label,
            component_alpha=problem.node_component_alpha,
            return_check=return_fields,
        )
        k_check = None
        if return_fields:
            K_slab, k_check = k_out
        else:
            K_slab = k_out

        def P_t(v):
            return tangential_projector(v, n_pure_f, Mn_pure_f, l2g_pure)

        def PKP(v):
            Kv = slab_to_flat(_slab_mv(K_slab, P_t(v), dmesh), n, d, dmesh)
            return P_t(Kv)

        N_flat = jax.vmap(flatten)(N)
        tmp_N = jax.vmap(PKP)(N_flat)  # [R, dn]
        N_dual_flat = jax.vmap(flatten)(N_dual)
        rhs_surface = PKP(sdot_flat.astype(dt_num))

        sel_V = operator_column_mask(
            jnp.asarray(problem.node_material), flatten(nv["normal"]), n, d
        )

        # ---- implicit monolithic operator ----
        # A_slab for the surface block: select V / -K columns, in slab rows
        @partial(
            shard_map,
            mesh=dmesh,
            in_specs=(P("rows", None), P("rows", None), P()),
            out_specs=P("rows", None),
            check_vma=False,
        )
        def _select(V_loc, K_loc, sel):
            return jnp.where(sel[None, :], V_loc, -K_loc)

        A_slab = _select(V_slab, K_slab, sel_V)

        tail = scale * N_dual_flat if cfg.grid_type == "Real" else N_dual_flat
        if cfg.grid_type == "ImposedVelocity":
            tail = jnp.zeros_like(N_dual_flat)

        rhs_tail = jnp.zeros((R,), dt_num)
        if cfg.grid_type != "Real":
            from ..ops.monolithic import imposed_tail_vector

            rhs = jnp.concatenate(
                [
                    jnp.zeros((d * n,), dt_num),
                    imposed_tail_vector(
                        R,
                        d,
                        cfg.imposed_component,
                        angle=cfg.angle_for_imposed_stuff,
                        rotate=cfg.extra_debug_info,
                        dtype=dt_num,
                    ),
                ]
            )
        else:
            rhs = jnp.concatenate([rhs_surface, rhs_tail])
        sysd = dict(
            euler=euler, A_slab=A_slab, tmp_N=tmp_N, tail=tail, rhs=rhs,
            pole=pole,
        )
        if return_fields:
            # per-frame output fields + invariant diagnostics (the swimmer
            # frame loop's txt/VTU emitters and per-frame checks); the
            # versor check comes from the correction's in-hand row sums
            v_null_pre = jnp.max(
                jnp.abs(slab_to_flat(resid_slab, n, d, dmesh))
            )
            sysd["fields"] = dict(
                N=N,
                normal=nv["normal"],
                N_dual_flat=N_dual_flat,
                N_dual_c_flat=jax.vmap(flatten)(N_dual_c),
                sel_V=sel_V,
                mass_body=mass_body,
                com_body=com_body,
                rhs_norm=jnp.linalg.norm(rhs),
                v_null_residual_pre=v_null_pre,
                k_solid_angle_check=k_check,
            )
        return sysd

    def make_matvec(sysd):
        A_slab, tmp_N, tail = sysd["A_slab"], sysd["tmp_N"], sysd["tail"]

        def matvec(x):  # x = [dn + R] replicated
            xs, u = x[: d * n], x[d * n :]
            y_surf = slab_to_flat(_slab_mv(A_slab, xs, dmesh), n, d, dmesh)
            y_surf = y_surf - scale * (u @ tmp_N)
            if cfg.grid_type == "ImposedVelocity":
                y_tail = scale * u
            else:
                y_tail = tail @ xs
            return jnp.concatenate([y_surf, y_tail])

        return matvec

    # ---- distributed stale-LU direct preconditioner (parallel.lu) ----
    fdt = (
        jnp.float32
        if cfg.solver.preconditioner_dtype == "float32"
        else dt_num
    )

    def direct_factor(sysd):
        """Distributed blocked-LU of the surface slab + bordered Schur
        complement for the R rigid tail rows/columns: with As = surface
        block, B = -scale tmp_N^T, T/D the tail rows, the preconditioner is
        the EXACT monolithic inverse [[As, B], [T, D]]^-1 expressed through
        Z = As^-1 B and S = D - T Z (one distributed LU solve per apply)."""
        from .lu import slab_reorder_columns, slab_lu_factor, slab_lu_solve

        A2 = slab_reorder_columns(sysd["A_slab"], n, d, dmesh).astype(fdt)
        lu, perm = slab_lu_factor(A2, dmesh)
        Zcols = []
        for r in range(R):
            brhs = flat_to_slab(
                (-scale * sysd["tmp_N"][r]).astype(fdt), n, d, dmesh
            )
            Zcols.append(
                slab_to_flat(slab_lu_solve(lu, perm, brhs, dmesh), n, d, dmesh)
            )
        Z = jnp.stack(Zcols, axis=1)  # [dn, R]
        if cfg.grid_type == "ImposedVelocity":
            T = jnp.zeros((R, d * n), fdt)
            D = scale * jnp.eye(R, dtype=fdt)
        else:
            T = sysd["tail"].astype(fdt)
            D = jnp.zeros((R, R), fdt)
        S_lu = jax.scipy.linalg.lu_factor(D - T @ Z)
        return dict(lu=lu, perm=perm, Z=Z, T=T, S_lu=S_lu)

    def direct_apply(fac):
        from .lu import slab_lu_solve

        def precond(x):
            b_s, b_u = x[: d * n], x[d * n :]
            w = slab_to_flat(
                slab_lu_solve(
                    fac["lu"],
                    fac["perm"],
                    flat_to_slab(b_s.astype(fdt), n, d, dmesh),
                    dmesh,
                ),
                n,
                d,
                dmesh,
            )
            x_u = jax.scipy.linalg.lu_solve(
                fac["S_lu"], b_u.astype(fdt) - fac["T"] @ w
            )
            x_s = w - fac["Z"] @ x_u
            return jnp.concatenate([x_s, x_u]).astype(x.dtype)

        return precond

    def make_precond(sysd):
        A_slab = sysd["A_slab"]
        if cfg.solver.preconditioner_type == "Jacobi":
            diag_slab = slab_diagonal(A_slab, n, d, dmesh)

            def precond(x):
                xs, u = x[: d * n], x[d * n :]
                ys = slab_to_flat(
                    flat_to_slab(xs, n, d, dmesh) / diag_slab, n, d, dmesh
                )
                return jnp.concatenate([ys, u])

        else:  # block-Jacobi-LU slab blocks (SOR/SSOR/ILU/AMG analogs)
            lu_slab, piv_slab = slab_block_jacobi_lu(A_slab, None, n, d, R, dmesh)

            def precond(x):
                xs, u = x[: d * n], x[d * n :]
                ys = slab_to_flat(
                    slab_block_jacobi_apply(
                        lu_slab, piv_slab, flat_to_slab(xs, n, d, dmesh), dmesh
                    ),
                    n,
                    d,
                    dmesh,
                )
                return jnp.concatenate([ys, u])

        return precond

    restart = cfg.solver.gmres_restart
    max_restarts = max(1, -(-cfg.solver.max_steps // max(restart, 1)))

    def solve_and_finish(sysd, precond):
        x, info = gmres(
            make_matvec(sysd),
            sysd["rhs"],
            precond=precond,
            restart=restart,
            tol=cfg.solver.tolerance,
            max_restarts=max_restarts,
        )
        rigid_vel = x[d * n :] * scale
        if return_fields:
            f = sysd["fields"]
            xs = x[: d * n]
            forces = jnp.where(f["sel_V"], xs, 0.0)
            f = dict(
                f,
                forces=forces,
                wall_velocities=jnp.where(f["sel_V"], 0.0, xs),
                F=f["N_dual_flat"] @ forces,
                F_complete=f["N_dual_c_flat"] @ forces,
            )
            sysd = dict(sysd, fields=f)

        # ---- rigid update: translation + rotation of body nodes about the
        # pole (forward-Euler axis-angle, reference `:4728-4846`) ----
        euler, pole = sysd["euler"], sysd["pole"]
        U = rigid_vel[:d]
        body = jnp.asarray(map_body, dt_num)[:, None]
        euler_next = euler + cfg.time_step * U[None, :] * body
        if cfg.consider_rigid_rotations:
            from ..physics.kinematics import update_rotation_matrix

            Rm = update_rotation_matrix(
                jnp.eye(d, dtype=dt_num),
                rigid_vel[d : 2 * d] if d == 3 else rigid_vel[d],
                cfg.time_step,
                forward_euler=True,
            )
            rotated = (euler_next - pole[None, :]) @ Rm.T + pole[None, :]
            euler_next = jnp.where(body > 0, rotated, euler_next)
        if return_fields:
            return rigid_vel, euler_next, info, sysd["fields"]
        return rigid_vel, euler_next, info

    if cfg.solver.preconditioner_type != "Direct":

        def step(euler, sdot_flat):
            sysd = build_system(euler, sdot_flat)
            return solve_and_finish(sysd, make_precond(sysd))

        return jax.jit(step)

    # Direct: two compiled variants + host-side stale-reuse bookkeeping
    # (reference refactor-on-trigger, `source/bem_stokes.cc:4336-4339`)
    @jax.jit
    def _step_fresh(euler, sdot_flat):
        sysd = build_system(euler, sdot_flat)
        fac = direct_factor(sysd)
        out = solve_and_finish(sysd, direct_apply(fac))
        return out + (fac,)

    @jax.jit
    def _step_stale(euler, sdot_flat, fac):
        sysd = build_system(euler, sdot_flat)
        return solve_and_finish(sysd, direct_apply(fac))

    state = {"factors": None, "last_iterations": 0, "refactored": False}

    def step(euler, sdot_flat):
        reuse = (
            state["factors"] is not None
            and state["last_iterations"]
            <= cfg.solver.refactor_iteration_trigger
        )
        if reuse:
            out = _step_stale(euler, sdot_flat, state["factors"])
            state["refactored"] = False
        else:
            *out, fac = _step_fresh(euler, sdot_flat)
            out = tuple(out)
            state["factors"] = fac
            state["refactored"] = True
        info = out[2]
        state["last_iterations"] = int(info["iterations"])
        return out

    step.stale_state = state
    return step


def sharded_heun_step(step, euler, sdot_flat, euler_pred=None, sdot_pred=None):
    """Heun predictor-corrector around a jitted sharded frame step: solve at
    `euler`, re-solve at the midpoint geometry, average the rigid velocities
    (reference `source/bem_stokes.cc:5787-5835`).  Mirroring the single-chip
    `SwimmerSimulation` Heun branch, the corrector runs at the NEXT frame's
    gait shape `euler_pred` with the next frame's gait velocity `sdot_pred`
    (both default to the predictor's outputs when the gait is frozen)."""
    rigid_vel, euler_next, info = step(euler, sdot_flat)
    if euler_pred is None:
        euler_pred = euler_next
    if sdot_pred is None:
        sdot_pred = sdot_flat
    rigid_vel2, _, info2 = step(euler_pred, sdot_pred)
    return 0.5 * (rigid_vel + rigid_vel2), info, info2


def _slab_mv(A_slab, x_flat, mesh):
    from .sharded import sharded_matvec

    return sharded_matvec(A_slab, x_flat, mesh)
