"""End-to-end flagellum / bacterium swimmer physics (reference
`tests/motility_flagellum.cc`, `rigidity_flagellum.cc`,
`bacteria_traslation.cc`, and the `solve_with_torque` motor-balance path
`source/bem_stokes.cc:3191-3356, 4374-4410`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.swimmer import SwimmerSimulation


def test_bare_helix_counter_rotation(tmp_path):
    """A bare helix's gait rotation IS a rigid mode, so the force/torque-free
    solve must return the exact counter-rotation omega_x = -omega_gait and
    zero translation (the invariant the whole flagellum pipeline hangs on)."""
    n_frames, dt = 8, 0.05
    cfg = ProblemConfig(
        use_flagellum_handler=True,
        imposed_rotation_as_flagellum_shape=True,
        flagellum_params=dict(n_length=24, n_around=8),
        n_frames=n_frames,
        time_step=dt,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Direct"),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    # the whole tube is flagellum (x > -0.1 everywhere)
    assert np.all(
        sim.problem.flagellum_node_mask == sim.problem.body_node_mask
    )
    hist = sim.run(0, 1)
    U = np.asarray(hist[0]["rigid_velocities"])
    omega_gait = -2.0 * np.pi / (dt * n_frames)
    # counter-rotation: total angular velocity zero
    assert U[3] == pytest.approx(-omega_gait, rel=2e-3)
    # no swimming for a bare helix (gait is rigid)
    assert np.all(np.abs(U[[0, 1, 2, 4, 5]]) < 5e-3 * abs(omega_gait))


def test_bare_helix_fd_gait(tmp_path):
    """Same invariant through the finite-difference gait pipeline: euler
    frames from the flagellum handler's phase rotation, sdot by FD
    (reference `project_shape_velocities` path)."""
    n_frames, dt = 16, 0.05
    cfg = ProblemConfig(
        use_flagellum_handler=True,
        flagellum_params=dict(n_length=20, n_around=8),
        n_frames=n_frames,
        time_step=dt,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    hist = sim.run(0, 1)
    U = np.asarray(hist[0]["rigid_velocities"])
    # FD of the +theta phase rotation: gait rate +2 pi/(n dt) about x, so the
    # body counter-rotates at -2 pi/(n dt); FD truncation is O(dtheta)
    omega_gait = 2.0 * np.pi / (dt * n_frames)
    assert U[3] == pytest.approx(-omega_gait, rel=0.2)
    assert abs(U[0]) < 0.05 * abs(omega_gait)


@pytest.fixture(scope="module")
def bacterium_mesh():
    return read_mesh(
        "/root/reference/tests/grid_test/bacterium_0.msh",
        dim=3,
        force_material=0,  # the reference zeroes material ids on read (:520)
    )


def test_bacterium_motility_imposed_rotation(bacterium_mesh):
    """Head + rotating flagellum: the classic micro-swimmer. The solve must
    produce a nonzero swimming speed along the axis and a head
    counter-rotation opposing the imposed flagellum rotation (reference
    `motility_flagellum.cc` physics)."""
    n_frames, dt = 10, 0.1
    cfg = ProblemConfig(
        imposed_rotation_as_flagellum_shape=True,
        n_frames=n_frames,
        time_step=dt,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(bacterium_mesh, cfg)
    # head/flagellum split at x > -0.1 (reference :1967-1971)
    assert prob.flagellum_node_mask.sum() > 0
    assert prob.head_node_mask.sum() > 0
    euler = prob.initial_euler()
    omega = -2.0 * np.pi / (dt * n_frames)
    sdot = omega * prob.flagellum_torque_mode(euler)
    from bemstokes_tpu.physics.rigid import flatten

    res = prob.solve_frame(euler, flatten(sdot))
    U = res["rigid_velocities"]
    assert res["residual"] < 1e-8
    # body counter-rotates: opposite sign to the imposed gait rotation
    assert np.sign(U[3]) == -np.sign(omega)
    assert abs(U[3]) < abs(omega)  # partial counter-rotation (head drag)
    # swimming: nonzero axial speed, well below the tangential gait speed
    assert abs(U[0]) > 1e-4
    assert abs(U[0]) < abs(omega)
    # off-axis components stay subdominant for the near-axisymmetric swimmer
    assert np.all(np.abs(U[[1, 2]]) < np.abs(U[0]) * 5)


def test_bacterium_solve_with_torque(bacterium_mesh):
    """Motor-torque balance: the flagellum rotation rate becomes an unknown
    driven by an imposed motor torque of -2 (reference `solve_with_torque`,
    `source/bem_stokes.cc:3340-3356`, motor_torque output `:4374-4384`)."""
    cfg = ProblemConfig(
        solve_with_torque=True,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(bacterium_mesh, cfg)
    euler = prob.initial_euler()
    res = prob.solve_frame(euler, jnp.zeros((3 * prob.n,)))
    assert res["residual"] < 1e-8
    # the motor-balance row enforces N_torque_dual . f = -2 exactly
    assert res["motor_torque"] == pytest.approx(-2.0, rel=1e-8)
    omega = res["flagellum_omega"]
    assert np.isfinite(omega) and abs(omega) > 1e-3
    U = res["rigid_velocities"]
    # body counter-rotates against the motor-driven flagellum
    assert np.sign(U[3]) == -np.sign(omega)
    # and swims
    assert abs(U[0]) > 1e-6
    # consistency with the imposed-rotation path: scaling the gait rate to
    # the solved omega must reproduce the same rigid velocities (linearity)
    sdot = omega * prob.flagellum_torque_mode(euler)
    from bemstokes_tpu.physics.rigid import flatten

    cfg2 = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        imposed_rotation_as_flagellum_shape=True,
        solver=SolverConfig(solve_directly=True),
    )
    prob2 = StokesBEMProblem(bacterium_mesh, cfg2)
    res2 = prob2.solve_frame(euler, flatten(sdot))
    np.testing.assert_allclose(
        res2["rigid_velocities"], U, rtol=1e-6, atol=1e-10
    )
    # and the torque transmitted by that gait is the imposed -2
    assert res2["motor_torque"] == pytest.approx(-2.0, rel=1e-6)


def test_bacterium_torque_swimmer_loop(tmp_path):
    """solve_with_torque through the frame loop: motor_torque.txt and
    center_of_mass/origin txt series are emitted, flagellum omega recorded,
    displacements integrate along the swim direction."""
    import os

    cfg = ProblemConfig(
        solve_with_torque=True,
        input_grid_path="/root/reference/tests/grid_test/",
        input_grid_base_name="bacterium_",
        n_frames=3,
        time_step=0.05,
        grid_type="Real",
        force_pole="Origin",
        consider_rigid_displacements=True,
        rigid_displacement_axes=(True, True, True),
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    hist = sim.run(0, 2)
    assert all("flagellum_omega" in h for h in hist)
    assert os.path.exists(tmp_path / "motor_torque.txt")
    assert os.path.exists(tmp_path / "center_of_mass_position.txt")
    assert os.path.exists(tmp_path / "origin_velocities.txt")
    torques = np.loadtxt(tmp_path / "motor_torque.txt")
    np.testing.assert_allclose(np.atleast_1d(torques), -2.0, rtol=1e-6)
    # swimming displacement accumulated along x
    assert abs(sim.state.displacements[:, 0]).max() > 0


def test_flagellum_translation_mode_solve():
    """imposed_translation_as_flagellum_shape: unit x-velocity of the
    flagellum surface (reference `:5704-5713`); for an all-flagellum body
    this is rigid translation, so U_x = -1 exactly (counter-translation)."""
    from bemstokes_tpu.flagella import FlagellumConfig, create_initial_flagellum_mesh
    from bemstokes_tpu.physics.rigid import flatten

    mesh = create_initial_flagellum_mesh(FlagellumConfig(), 16, 8)
    cfg = ProblemConfig(
        imposed_translation_as_flagellum_shape=True,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    sdot = flatten(prob.flagellum_translation_mode())
    res = prob.solve_frame(prob.initial_euler(), sdot)
    U = res["rigid_velocities"]
    assert U[0] == pytest.approx(-1.0, rel=1e-6)
    assert np.all(np.abs(U[1:]) < 1e-6)
