"""Parity tests for the reference's `dof_renumbering.cc` (assembled operator
rows invariant under node renumbering) and `alpha_test_quad_order.cc` (the
solid-angle machinery stable across quadrature orders / singular rules)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, QuadratureConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def _assemble(mesh, quad_order=3, singular_type="Mixed", singular_order=5):
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig(
        quad_order=quad_order,
        singular_quadrature_type=singular_type,
        singular_quadrature_order=singular_order,
    )
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)
    return assemble_V_K(euler, sp, tables), space.n_nodes


def test_assembly_invariant_under_renumbering():
    """`dof_renumbering.cc`: permuting the mesh's vertex numbering permutes
    the assembled operator rows/columns and changes nothing else."""
    mesh = read_mesh(SPHERE, dim=3)
    (V0, K0), n = _assemble(mesh)

    rng = np.random.default_rng(5)
    perm = rng.permutation(mesh.n_vertices)  # old vertex id -> new id
    verts2 = np.empty_like(mesh.vertices)
    verts2[perm] = mesh.vertices
    mesh2 = SurfaceMesh(
        verts2, perm[mesh.cells].astype(np.int32), mesh.material_id.copy()
    )
    (V1, K1), n2 = _assemble(mesh2)
    assert n2 == n

    # component-blocked flat index map: (a, i) -> a*n + perm[i]
    p = np.concatenate([a * n + perm for a in range(3)])
    assert np.allclose(np.asarray(V1)[np.ix_(p, p)], np.asarray(V0), atol=1e-12)
    assert np.allclose(np.asarray(K1)[np.ix_(p, p)], np.asarray(K0), atol=1e-12)


def test_k_versor_check_across_quad_orders():
    """`alpha_test_quad_order.cc` analog: the post-correction K . e_c check
    is exactly 1 at every quadrature order (the exterior convention is
    enforced, not approximated), and the pre-correction V-nullspace residual
    sits in the reference's golden band (~2.2e-3 at this 294-dof mesh,
    `tests/sphere_translation.output:20-21`) — it is MESH-limited, so the
    quadrature order only perturbs it slightly."""
    mesh = read_mesh(SPHERE, dim=3)
    v_resid = {}
    for order in (2, 4, 6):
        cfg = ProblemConfig(
            grid_type="ImposedVelocity",
            imposed_component=0,
            force_pole="Origin",
            quadrature=QuadratureConfig(order=order),
            solver=SolverConfig(solve_directly=True),
        )
        prob = StokesBEMProblem(mesh, cfg)
        res = prob.solve_frame(
            prob.initial_euler(), jnp.zeros((3 * prob.n,))
        )
        k_check = np.asarray(res["diagnostics"]["k_solid_angle_check"])
        assert np.allclose(k_check, 1.0, atol=1e-12), (order, k_check)
        v_resid[order] = float(res["diagnostics"]["v_null_residual_pre"])
    # measured 2.16e-3 / 2.18e-3 / 2.18e-3 at orders 2/4/6 — the golden
    # band, stable in the order (mesh truncation dominates)
    for order, r in v_resid.items():
        assert 1e-3 < r < 4e-3, (order, v_resid)
    assert abs(v_resid[6] - v_resid[4]) < 0.1 * v_resid[4], v_resid


def test_drag_stable_across_singular_rules():
    """Duffy / Mixed / Telles singular rules agree on the physics (the
    reference's rule-selection knob, `source/bem_stokes.cc:4912-4986`)."""
    mesh = read_mesh(SPHERE, dim=3)
    drags = {}
    for rule in ("Mixed", "Duffy", "Telles"):
        cfg = ProblemConfig(
            grid_type="ImposedVelocity",
            imposed_component=0,
            force_pole="Origin",
            quadrature=QuadratureConfig(
                order=4, singular_type=rule, singular_order=7
            ),
            solver=SolverConfig(solve_directly=True),
        )
        prob = StokesBEMProblem(mesh, cfg)
        res = prob.solve_frame(
            prob.initial_euler(), jnp.zeros((3 * prob.n,))
        )
        import jax

        N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
        drags[rule] = abs(float((N_dual_flat @ res["stokes_forces"])[0]))
    vals = list(drags.values())
    for v in vals[1:]:
        assert v == pytest.approx(vals[0], rel=2e-3), drags
