"""Hanging-node constraint layer (reference hanging-node handling:
`source/bem_stokes.cc:1654-1656` detection via deal.II, `:2970-2995`
constrained monolithic rows, `refine_walls` `:1478-1519` as the producer)."""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.mesh.constraints import hanging_node_constraints
from bemstokes_tpu.problem import StokesBEMProblem


def test_conforming_mesh_has_no_constraints(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    hc = hanging_node_constraints(mesh)
    assert hc.n == 0
    hc2 = hanging_node_constraints(refine_uniform(mesh, SphericalManifold()))
    assert hc2.n == 0


def test_local_refinement_detection(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    fine = refine_uniform(mesh, cell_filter=centers[:, 0] > 0.0)
    hc = hanging_node_constraints(fine)
    assert hc.n > 0
    # every slave sits at the linear midpoint of its two masters, weights 1/2
    for i in range(hc.n):
        w = hc.weights[i]
        live = w != 0
        assert np.isclose(w.sum(), 1.0)
        assert np.count_nonzero(live) == 2
        assert np.allclose(w[live], 0.5)
        mid = (hc.weights[i][live][:, None] * fine.vertices[hc.masters[i][live]]).sum(0)
        assert np.allclose(fine.vertices[hc.slaves[i]], mid, atol=1e-12)


def test_solve_on_locally_refined_sphere(reference_grid_dir):
    """Drag on a non-conforming (half-refined) sphere must still approach
    Stokes law, and the solved tractions must satisfy the interpolation
    constraints exactly."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    mesh = refine_uniform(
        mesh, SphericalManifold(), cell_filter=centers[:, 0] > 0.0
    )
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        body_manifold="sphere",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.hanging.n > 0
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    assert res["residual"] < 1e-8

    import jax
    from bemstokes_tpu.physics.rigid import flatten

    N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
    F = np.asarray(N_dual_flat @ res["stokes_forces"])
    drag = 6 * np.pi
    assert abs(abs(F[0]) - drag) / drag < 0.05, F

    # constraint satisfaction on the solved surface unknowns
    f = np.asarray(res["stokes_forces"]).reshape(3, prob.n)
    hc = prob.hanging
    interp = np.einsum("hm,chm->ch", hc.weights, f[:, hc.masters])
    assert np.allclose(f[:, hc.slaves], interp, atol=1e-9)


def test_exact_records_beat_geometric_heuristic():
    """On a coarse, strongly curved mesh (edges subtending ~90 deg of arc)
    the manifold-snapped midpoint overshoots the chord by ~8%, defeating the
    old between-ness heuristic; the refiner's exact parent-edge records must
    still find every hanging node (ADVICE r1, constraints.py:64)."""
    from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh

    # two coarse quads on the unit sphere around the equator, each spanning
    # 90 degrees of arc in both directions
    def s(lon, lat):
        lon, lat = np.radians(lon), np.radians(lat)
        return [
            np.cos(lat) * np.cos(lon),
            np.cos(lat) * np.sin(lon),
            np.sin(lat),
        ]

    verts = np.asarray(
        [
            s(-90, -45), s(0, -45), s(-90, 45), s(0, 45),  # quad A corners
            s(90, -45), s(90, 45),  # quad B extra corners
        ]
    )
    cells = np.asarray([[0, 1, 2, 3], [1, 4, 3, 5]], dtype=np.int32)
    mesh = SurfaceMesh(verts, cells, np.zeros(2, np.int32))
    man = SphericalManifold(radius=1.0)
    # refine only quad A -> 3 hanging midpoints on the shared edge front
    fine = refine_uniform(mesh, man, cell_filter=np.asarray([True, False]))
    assert fine.edge_midpoints is not None
    hc = hanging_node_constraints(fine)
    # exactly one hanging node: the midpoint of the shared edge (1, 3)
    assert hc.n == 1
    mset = set(hc.masters[hc.weights != 0].tolist())
    assert mset == {1, 3}
    # verify the heuristic really would have failed here: the snapped
    # midpoint overshoots the chord by ~1/cos(theta/4) > 1.05
    m = int(hc.slaves[0])
    a, b = sorted(mset)
    lam = np.linalg.norm(fine.vertices[a] - fine.vertices[m])
    lmb = np.linalg.norm(fine.vertices[m] - fine.vertices[b])
    lab = np.linalg.norm(fine.vertices[a] - fine.vertices[b])
    assert lam + lmb > 1.05 * lab


def test_records_survive_merge(reference_grid_dir):
    """Welding walls onto a refined swimmer renumbers vertices; the exact
    parent-edge records must renumber along."""
    from bemstokes_tpu.mesh.factories import create_wall

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    fine = refine_uniform(mesh, cell_filter=centers[:, 0] > 0.0)
    before = hanging_node_constraints(fine)
    merged = fine.merged_with(create_wall((0.0, 5.0, 0.0), (8.0, 0.0, 8.0)))
    after = hanging_node_constraints(merged)
    assert after.n == before.n > 0
    for i in range(after.n):
        live = after.weights[i] != 0
        mid = (
            after.weights[i][live][:, None]
            * merged.vertices[after.masters[i][live]]
        ).sum(0)
        assert np.allclose(merged.vertices[after.slaves[i]], mid, atol=1e-12)


def test_q2_hanging_constraints_interpolation():
    """Degree-2 hanging-edge constraints must reproduce any globally
    quadratic field exactly: on a FLAT locally refined mesh (straight edges)
    the trace of a quadratic along an edge is a 1D quadratic, so slave
    values equal the constrained combination of masters bit-for-bit-ish."""
    from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh
    from bemstokes_tpu.mesh import build_scalar_space
    from bemstokes_tpu.mesh.constraints import hanging_node_constraints_for_space

    verts = np.array(
        [[x, y, 0.0] for y in (0.0, 1.0, 2.0) for x in (0.0, 1.0, 2.0)]
    )
    cells = np.array(
        [[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7], [4, 5, 7, 8]], np.int32
    )
    mesh = SurfaceMesh(verts, cells, np.zeros(4, np.int32))
    fine = refine_uniform(mesh, cell_filter=np.array([True, False, False, False]))
    for degree in (2, 3):
        space = build_scalar_space(fine, degree)
        hc = hanging_node_constraints_for_space(fine, space)
        assert hc.n > 0
        pos = space.node_positions()
        f = 1.0 + 2.0 * pos[:, 0] - 0.7 * pos[:, 1] + 0.3 * pos[:, 0] * pos[:, 1]
        if degree >= 2:
            f = f + 0.9 * pos[:, 0] ** 2 - 0.4 * pos[:, 1] ** 2
        lhs = f[hc.slaves]
        rhs = (hc.weights * f[hc.masters]).sum(axis=1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_q2_solve_on_locally_refined_sphere(reference_grid_dir):
    """End-to-end Q2 solve on a non-conforming sphere: the guard is gone,
    the solved system satisfies the constraints and approaches Stokes drag."""
    import jax.numpy as jnp
    from bemstokes_tpu.physics.rigid import flatten

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    centers = mesh.vertices[mesh.cells].mean(axis=1)
    mesh = refine_uniform(
        mesh, SphericalManifold(), cell_filter=centers[:, 0] > 0.0
    )
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        fe_degree=2,
        map_degree=1,
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.hanging.n > 0
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    assert res["residual"] < 1e-8
    # solved tractions satisfy the interpolation constraints exactly
    hc = prob.hanging
    f = np.asarray(res["stokes_forces"]).reshape(3, prob.n)
    for c in range(3):
        lhs = f[c][hc.slaves]
        rhs = (hc.weights * f[c][hc.masters]).sum(axis=1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)
    F = float(
        jnp.dot(
            flatten(jnp.asarray(res["operators"]["N_dual"][0])),
            res["stokes_forces"],
        )
    )
    assert abs(abs(F) - 6 * np.pi) / (6 * np.pi) < 0.05
