"""End-to-end single-frame solves on the coarse sphere meshes — the
framework's correctness gate (reference analogs: `tests/sphere_translation.cc`,
`tests/alpha_test.cc`, `tests/rigidity_sphere.cc`; golden diagnostics in
`tests/sphere_translation.output` and `tests/rigidity_sphere.output`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh


@pytest.fixture(scope="module")
def sphere_problem(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=False, preconditioner_type="Direct"),
    )
    return StokesBEMProblem(mesh, cfg), mesh


def test_operator_identities(sphere_problem, reference_grid_dir):
    """V null-space residual pre-correction and solid-angle identity post-
    correction (reference golden: ~2.5e-3 at 294-324 dofs; K e = 1)."""
    prob, mesh = sphere_problem
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)
    res = prob.solve_frame(euler0, sdot)
    d = res["diagnostics"]
    assert d["v_null_residual_pre"] < 5e-3  # reference: 2.2e-3 @ 294 dofs
    assert np.allclose(d["k_solid_angle_check"], 1.0, atol=1e-10)
    assert abs(d["mass_body"] - 4 * np.pi) / (4 * np.pi) < 0.05
    # system actually solved
    assert res["residual"] < 1e-8


def test_sphere_translation(sphere_problem, reference_grid_dir):
    """Rigid sphere translation: frames 0 -> 1 are the sphere shifted by
    1/120 in x; the solved rigid velocity must recover dx/dt (reference
    `tests/sphere_translation.cc:60-96`; observed accuracy 8.4e-3 on this
    coarse mesh)."""
    prob, mesh = sphere_problem
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    dt = prob.cfg.time_step
    exact_velocity = (1.0 / 120.0) / dt
    sdot = prob.shape_velocities_fd(euler0, euler1)
    res = prob.solve_frame(euler0, sdot)
    U = res["rigid_velocities"]
    rel = abs(U[0] - exact_velocity) / exact_velocity
    assert rel < 2e-2, (U, exact_velocity)
    for i in range(1, 3):
        assert abs(U[i]) < 1e-4 * exact_velocity + 1e-8, U
    for i in range(3, 6):
        assert abs(U[i]) < 1e-3, U


def test_sphere_drag_stokes_law(reference_grid_dir):
    """ImposedVelocity U = e_x: the traction resultant must match the Stokes
    drag 6 pi mu a U (BASELINE config #1)."""
    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_half_refined_0.inp", dim=3, force_material=0
    )
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res = prob.solve_frame(euler, sdot)
    # rigid velocity is imposed exactly
    assert abs(res["rigid_velocities"][0] - 1.0) < 1e-10
    from bemstokes_tpu.physics.rigid import flatten
    import jax

    N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
    F = np.asarray(N_dual_flat @ res["stokes_forces"])
    drag = 6 * np.pi  # mu = a = 1
    rel = abs(abs(F[0]) - drag) / drag
    assert rel < 0.05, (F, drag)
    # transverse force components vanish by symmetry
    assert abs(F[1]) < 0.05 * drag
    assert abs(F[2]) < 0.05 * drag


def test_sphere_drag_high_order_geometry(reference_grid_dir):
    """BASELINE accuracy target: drag within 1e-6 of Stokes law.  Curved Q2
    mapping with manifold-snapped nodes on the once-refined sphere reaches
    1.3e-6 at only 386 scalar nodes; Q4 mapping reaches 8.8e-10 (convergence
    study in the euler_from_mesh docstring)."""
    from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
    from bemstokes_tpu.physics.rigid import flatten
    import jax

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh = refine_uniform(mesh, SphericalManifold(), times=1)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        map_degree=4,
        body_manifold="sphere",
        quadrature=__import__(
            "bemstokes_tpu.config", fromlist=["QuadratureConfig"]
        ).QuadratureConfig(order=6, singular_order=9),
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
    F = np.asarray(N_dual_flat @ res["stokes_forces"])
    drag = 6 * np.pi
    assert abs(abs(F[0]) - drag) / drag < 1e-6, F


def test_translation_with_mixed_degrees(reference_grid_dir):
    """Q2 curved mapping + Q1 unknowns: the degree-mismatch shape-velocity
    projection (reference `project_shape_velocities`, `source/bem_stokes.cc:
    2145-2242`) must still recover the rigid translation."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        fe_degree=1,
        map_degree=2,
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)
    assert sdot.shape == (3 * prob.n,)
    res = prob.solve_frame(euler0, sdot)
    exact = (1.0 / 120.0) / prob.cfg.time_step
    assert abs(res["rigid_velocities"][0] - exact) / exact < 2e-2


def test_mobility_isotropy(reference_grid_dir):
    """ImposedForce e_x: off-diagonal rigid velocities are small relative to
    the diagonal response (reference `tests/rigidity_sphere.cc`, tol 6e-3)."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_half_refined_0.inp", dim=3, force_material=0)
    cfg = ProblemConfig(
        grid_type="ImposedForce",
        imposed_component=0,
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    res = prob.solve_frame(euler, jnp.zeros((3 * prob.n,)))
    U = res["rigid_velocities"]
    for j in range(1, 6):
        assert abs(U[j] / U[0]) < 6e-3, U
    # mobility of a unit sphere: U = F / (6 pi mu a)
    assert abs(abs(U[0]) - 1.0 / (6 * np.pi)) / (1.0 / (6 * np.pi)) < 0.05


def test_q0_discontinuous_elements(reference_grid_dir):
    """Piecewise-constant (Q0) unknowns with a Q1 geometry map — the
    reference's FE_DGQ configurations (`V_test_with_Green_2d_Q0.cc`,
    parsed-FE Q0 options).  Collocation at cell centers keeps the full
    pipeline (corrections, monolithic coupling, Direct solve) intact and
    the sphere drag lands within 1% of Stokes law on the coarse mesh."""
    import jax.numpy as jnp

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.problem import StokesBEMProblem

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        fe_degree=0,
        map_degree=1,
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.n == mesh.n_cells  # one node per cell
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    assert res["residual"] < 1e-10
    F = np.asarray(res["rigid_forces_pole"])
    assert abs(abs(F[0]) - 6 * np.pi) / (6 * np.pi) < 1e-2
    # transverse components vanish by symmetry
    assert np.all(np.abs(F[1:3]) < 1e-6 * abs(F[0]))
