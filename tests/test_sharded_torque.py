"""Motor-torque runs on the DISTRIBUTED path: the torque row/column is
folded through the sharded step's implicit matvec and the bordered tail of
the distributed LU (reference rank-0 torque row/column
`source/bem_stokes.cc:3297-3356`, omega/motor-torque outputs `:4374-4410`),
matching the single-chip solve to 1e-7."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step
from bemstokes_tpu.swimmer import SwimmerSimulation

BACTERIUM = "/root/reference/tests/grid_test/bacterium_0.msh"


@pytest.fixture(scope="module")
def bacterium_mesh():
    return read_mesh(BACTERIUM, dim=3, force_material=0)


def test_distributed_torque_matches_single_chip(bacterium_mesh):
    """solve_with_torque on the 8-device mesh: rigid velocities, flagellum
    omega and transmitted motor torque agree with the single-chip Direct
    solve; the exact bordered tail keeps the 1-iteration operating point."""
    cfg = ProblemConfig(
        solve_with_torque=True,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(bacterium_mesh, cfg)
    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)

    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    U, _, info, fields = step(euler, sdot)
    assert int(info["iterations"]) <= 2

    U = np.asarray(U)
    U_ref = np.asarray(res_ref["rigid_velocities"])
    assert np.abs(U - U_ref).max() / max(np.abs(U_ref).max(), 1e-30) < 1e-7

    omega = float(fields["flagellum_omega"])
    assert omega == pytest.approx(res_ref["flagellum_omega"], rel=1e-7)
    assert float(fields["motor_torque"]) == pytest.approx(-2.0, rel=1e-7)

    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7

    # the solved gait velocity field matches too
    sv = np.asarray(fields["shape_velocities_flat"])
    sv_ref = np.asarray(res_ref["shape_velocities"])
    assert np.abs(sv - sv_ref).max() / max(np.abs(sv_ref).max(), 1e-30) < 1e-6


def test_distributed_imposed_rotation_motor_torque(bacterium_mesh):
    """imposed_rotation_as_flagellum_shape distributed: the transmitted
    motor torque (torque_dual . f) is reported and matches single-chip."""
    n_frames, dt = 10, 0.1
    cfg = ProblemConfig(
        imposed_rotation_as_flagellum_shape=True,
        n_frames=n_frames,
        time_step=dt,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(bacterium_mesh, cfg)
    euler = prob.initial_euler()
    omega = -2.0 * np.pi / (dt * n_frames)
    from bemstokes_tpu.physics.rigid import flatten

    sdot = flatten(omega * prob.flagellum_torque_mode(euler))
    res_ref = prob.solve_frame(euler, sdot)

    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    U, _, info, fields = step(euler, sdot)
    U_ref = np.asarray(res_ref["rigid_velocities"])
    assert np.abs(np.asarray(U) - U_ref).max() / np.abs(U_ref).max() < 1e-7
    assert float(fields["motor_torque"]) == pytest.approx(
        res_ref["motor_torque"], rel=1e-7
    )
    assert "flagellum_omega" not in fields  # no torque unknown in this run


def test_distributed_torque_swimmer_loop(tmp_path):
    """The bacterium motor-torque frame loop with cfg.distributed=True:
    motor_torque.txt / omega history / displacement integration all work
    through the sharded step, agreeing with the single-chip loop."""
    base = dict(
        solve_with_torque=True,
        input_grid_path="/root/reference/tests/grid_test/",
        input_grid_base_name="bacterium_",
        n_frames=3,
        time_step=0.05,
        grid_type="Real",
        force_pole="Origin",
        consider_rigid_displacements=True,
        rigid_displacement_axes=(True, True, True),
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    out_ref = str(tmp_path / "single")
    hist_ref = SwimmerSimulation(ProblemConfig(**base), out_ref).run(0, 2)

    out_d = str(tmp_path / "dist")
    cfg_d = ProblemConfig(**base, distributed=True)
    sim = SwimmerSimulation(cfg_d, out_d)
    hist = sim.run(0, 2)

    assert all("flagellum_omega" in h for h in hist)
    for h, h_ref in zip(hist, hist_ref):
        np.testing.assert_allclose(
            h["rigid_velocities"], h_ref["rigid_velocities"], rtol=1e-6
        )
        assert h["flagellum_omega"] == pytest.approx(
            h_ref["flagellum_omega"], rel=1e-6
        )
    torques = np.loadtxt(os.path.join(out_d, "motor_torque.txt"))
    np.testing.assert_allclose(np.atleast_1d(torques), -2.0, rtol=1e-6)
