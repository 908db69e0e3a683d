"""Multi-frame swimmer simulation over the sphere-translation gait +
restart + composer (reference `run()` and `composer` flows).  The gait has
two frames (sphere shifted by 1/120 in x); with n_frames=2 the stroke wraps,
so frame 0 -> 1 gives +U and frame 1 -> 0 gives -U."""

import os

import numpy as np
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.swimmer import SwimmerSimulation, SwimmerState


def make_cfg(reference_grid_dir, **kw):
    defaults = dict(
        grid_type="Real",
        force_pole="Origin",
        n_frames=2,
        input_grid_path=f"{reference_grid_dir}/",
        input_grid_base_name="sphere_translation_",
        input_grid_format="msh",
        consider_rigid_displacements=True,
        rigid_displacement_axes=(True, True, True),
        solver=SolverConfig(solve_directly=True),
    )
    defaults.update(kw)
    return ProblemConfig(**defaults)


def test_full_stroke_and_restart(reference_grid_dir, tmp_path):
    cfg = make_cfg(reference_grid_dir)
    sim = SwimmerSimulation(cfg, output_dir=str(tmp_path))
    hist = sim.run(0, 2)
    assert len(hist) == 2
    exact = (1.0 / 120.0) / cfg.time_step
    assert abs(hist[0]["rigid_velocities"][0] - exact) / exact < 2e-2
    assert abs(hist[1]["rigid_velocities"][0] + exact) / exact < 2e-2
    # displacement after the full (closed) stroke cancels to ~0
    disp = sim.state.displacements
    body = sim.map_body_mask[:, 0] > 0
    assert np.max(np.abs(disp[body, 0])) < 1e-4
    # outputs
    assert os.path.exists(tmp_path / "result_0.npz")
    assert os.path.exists(tmp_path / "stokes_1.vtu")
    assert os.path.exists(tmp_path / "point_velocities.txt")

    # restart from the saved state after frame 0
    st = SwimmerState.load(str(tmp_path / "state_0.npz"))
    expected = cfg.time_step * exact
    assert np.allclose(st.displacements[body, 0], expected, rtol=3e-2)
    cfg2 = make_cfg(reference_grid_dir, use_previous_state=True)
    sim2 = SwimmerSimulation(cfg2, output_dir=str(tmp_path))
    hist2 = sim2.run(1, 2)
    assert abs(hist2[0]["rigid_velocities"][0] + exact) / exact < 2e-2

    # composer over the stroke
    mean_U = sim.compose(0, 2)
    assert abs(mean_U[0]) < 2e-2 * exact  # closed stroke: zero mean
    assert os.path.exists(tmp_path / "composed_1.vtu")


def test_heun_integration(reference_grid_dir, tmp_path):
    cfg = make_cfg(
        reference_grid_dir,
        time_integration="Heun",
        consider_rigid_displacements=False,
    )
    s = SwimmerSimulation(cfg, output_dir=str(tmp_path))
    hist = s.run(0, 1)
    exact = (1.0 / 120.0) / cfg.time_step
    # Heun over the wrapping 2-frame stroke averages +U (frame 0) and the
    # predictor's -U (frame 1) contributions to ~0
    U_mean = hist[0]["rigid_velocities"][0]
    assert abs(U_mean) < 2e-2 * exact, U_mean


def test_stale_lu_reused_across_frames(reference_grid_dir):
    """Reference DirectPreconditioner semantics (`direct_preconditioner.cc`,
    refactor trigger `source/bem_stokes.cc:4336-4339, 5768-5779`): factor on
    the first frame (GMRES then converges in ~1 iteration,
    `tests/sphere_translation.output:30`), REUSE the stale factors on later
    frames, refactor only when an iteration count blows past the trigger."""
    import jax.numpy as jnp
    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.fem.geometry import euler_from_mesh

    mesh0 = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(mesh0, cfg)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)

    res0 = prob.solve_frame(euler0, sdot)
    assert res0["refactored"] is True
    assert res0["iterations"] <= 2  # fresh LU: reference golden output = 1
    assert res0["converged"]

    # frame 2: slightly different geometry, stale factors must be REUSED
    res1 = prob.solve_frame(euler1, -sdot)
    assert res1["refactored"] is False
    assert res1["converged"]
    assert res1["iterations"] <= 25  # stale LU still a strong preconditioner

    # blowup path: fake a pathological previous solve -> next frame refactors
    prob._last_direct_iterations = 10_000
    res2 = prob.solve_frame(euler0, sdot)
    assert res2["refactored"] is True
    assert res2["iterations"] <= 2


def test_solver_max_steps_honored(reference_grid_dir):
    """solver.max_steps caps the GMRES work and non-convergence is surfaced
    (reference SolverControl, `source/bem_stokes.cc:470-472`)."""
    import warnings
    import jax.numpy as jnp
    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.problem import StokesBEMProblem

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        solver=SolverConfig(
            preconditioner_type="Jacobi",
            tolerance=1e-13,
            gmres_restart=5,
            max_steps=10,
        ),
    )
    prob = StokesBEMProblem(mesh, cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    assert res["iterations"] <= 10
    assert not res["converged"]
    assert any("GMRES did not converge" in str(x.message) for x in w)


def test_vtu_output_fields_and_subcells(tmp_path, reference_grid_dir):
    """VTU output parity: normals / rigid-mode / shape-velocity fields and
    degree-correct sub-celled connectivity for fe_degree=2 (reference
    `output_save_stokes_results`, `source/bem_stokes.cc:5164-5262`)."""
    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.swimmer import SwimmerSimulation

    cfg = ProblemConfig(
        input_grid_path=f"{reference_grid_dir}/",
        input_grid_base_name="sphere_translation_",
        n_frames=2,
        fe_degree=2,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    sim.run(0, 1)
    vtu = (tmp_path / "stokes_0.vtu").read_text()
    for field in (
        "forces",
        "total_velocities",
        "shape_velocities",
        "normals",
        "rigid_mode_0",
        "rigid_mode_5",
    ):
        assert f'Name="{field}"' in vtu
    # degree 2 -> 4 subquads per mesh cell
    n_cells = sim.mesh.n_cells
    assert f'NumberOfCells="{4 * n_cells}"' in vtu
    # points are the fe-space nodes, not just the vertices
    assert f'NumberOfPoints="{sim.problem.fe_space.n_nodes}"' in vtu


def test_heun_is_predictor_corrector_average(reference_grid_dir, tmp_path):
    """Pins the exact Heun semantics (reference `source/bem_stokes.cc:
    5787-5835`): the recorded velocity is 0.5 * (U_predictor + U_corrector),
    where the corrector re-solves at the NEXT frame's gait geometry under the
    predictor-advanced rigid state.  Any other averaging scheme fails the
    1e-12 agreement."""
    import jax.numpy as jnp

    cfg = make_cfg(
        reference_grid_dir,
        time_integration="Heun",
        consider_rigid_displacements=True,
    )
    sim = SwimmerSimulation(cfg, output_dir=str(tmp_path / "heun"))
    hist = sim.run(0, 1)
    U_heun = np.asarray(hist[0]["rigid_velocities"])

    # replay the two solves by hand on a fresh simulation
    ref = SwimmerSimulation(
        make_cfg(reference_grid_dir, consider_rigid_displacements=True),
        output_dir=str(tmp_path / "manual"),
    )
    euler0 = ref.euler_for_frame(0)
    sdot0 = ref.shape_velocities(0, euler0)
    res0 = ref.problem.solve_frame(euler0, sdot0, jnp.asarray(ref.state.rotation))
    U0 = np.asarray(res0["rigid_velocities"])
    ref._advance_state(U0, jnp.asarray(res0["operators"]["N"]))
    euler1 = ref.euler_for_frame(1)
    sdot1 = ref.shape_velocities(1, euler1)
    res1 = ref.problem.solve_frame(euler1, sdot1, jnp.asarray(ref.state.rotation))
    U1 = np.asarray(res1["rigid_velocities"])

    assert np.allclose(U_heun, 0.5 * (U0 + U1), atol=1e-12), (
        U_heun,
        0.5 * (U0 + U1),
    )
