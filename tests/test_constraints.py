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
