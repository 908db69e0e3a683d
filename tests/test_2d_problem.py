"""2D (dim=2) end-to-end problem tests through `solve_frame` — the circle
counterpart of the sphere solves (reference 2D families `tests/test_bie_2.cc`,
`V_test_with_Green_2d.cc`, and the `bem_stokes_2d` executable)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten

CIRCLE = "/root/reference/tests/grid_test/circle_0.inp"


def _circle_problem(grid_type, component=0, refine=2):
    mesh = read_mesh(CIRCLE, dim=2, force_material=0)
    if refine:
        mesh = refine_uniform(mesh, SphericalManifold((0.0, 0.0)), times=refine)
    cfg = ProblemConfig(
        dim=2,
        grid_type=grid_type,
        imposed_component=component,
        force_pole="Origin",
        quadrature=None or ProblemConfig().quadrature,
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.num_rigid == 3  # 2 translations + 1 rotation
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((2 * prob.n,)))
    return prob, res


def _rigid_forces(prob, res):
    N_dual = res["operators"]["N_dual"]
    return np.array(
        [
            float(jnp.dot(flatten(jnp.asarray(N_dual[r])), res["stokes_forces"]))
            for r in range(prob.num_rigid)
        ]
    )


def test_circle_imposed_velocity():
    """Translating circle: consistent solve, pure x-drag (symmetry kills the
    transverse force and the torque)."""
    prob, res = _circle_problem("ImposedVelocity", component=0)
    assert res["residual"] < 1e-10
    F = _rigid_forces(prob, res)
    assert abs(F[0]) > 1.0  # 2D Stokeslet drag at this truncation scale
    assert abs(F[1]) < 1e-8 * abs(F[0])
    assert abs(F[2]) < 1e-8 * abs(F[0])


def test_circle_imposed_rotation():
    """Rotating circle: the exact exterior solution exists in 2D (no Stokes
    paradox for rotation): torque T = 4 pi mu omega a^2 for a unit circle."""
    prob, res = _circle_problem("ImposedVelocity", component=2, refine=3)
    assert res["residual"] < 1e-10
    F = _rigid_forces(prob, res)
    assert abs(F[2]) == pytest.approx(4.0 * np.pi, rel=2e-3)
    assert abs(F[0]) < 1e-8 and abs(F[1]) < 1e-8


def test_circle_force_velocity_consistency():
    """Mobility/resistance duality: ImposedForce with unit x-force must
    return U_x = 1 / R_xx where R_xx is the ImposedVelocity drag (reference
    `motility_*` vs `rigidity_*` test pairing)."""
    prob_v, res_v = _circle_problem("ImposedVelocity", component=0)
    R_xx = _rigid_forces(prob_v, res_v)[0]
    prob_f, res_f = _circle_problem("ImposedForce", component=0)
    U = res_f["rigid_velocities"]
    assert U[0] == pytest.approx(1.0 / R_xx, rel=1e-8)
    assert abs(U[1]) < 1e-10 and abs(U[2]) < 1e-10


def test_circle_swimmer_loop(tmp_path):
    """dim=2 through the full SwimmerSimulation frame loop (static gait:
    rigid velocities must vanish, outputs still emitted)."""
    import os
    from bemstokes_tpu.swimmer import SwimmerSimulation

    cfg = ProblemConfig(
        dim=2,
        input_grid_path="/root/reference/tests/grid_test/",
        input_grid_base_name="circle_",
        input_grid_format="inp",
        n_frames=2,
        time_step=0.1,
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    hist = sim.run(0, 2)
    for h in hist:
        assert np.max(np.abs(h["rigid_velocities"])) < 1e-8
    assert os.path.exists(tmp_path / "stokes_0.vtu")
    assert os.path.exists(tmp_path / "point_velocities.txt")


def test_circle_spinning_gait_recovers_rotation(tmp_path):
    """2D rotation in the frame loop (reference 2D rigid machinery,
    `source/bem_stokes.cc:2441-2788` 2D branches): a 2-frame gait whose
    frames are the same circle rotated by alpha is a rigid-rotation "gait",
    and a torque-free body cannot follow it — the solve returns the
    counter-rotation omega ~ -alpha/dt (exactly like sphere_translation: the
    gait moves -x and U comes out +Delta/dt), `_advance_state` rotates the
    accumulated 2x2 body rotation by omega*dt, and the lab-frame geometry of
    the next frame stays put (gait rotation cancelled by the body state)."""
    import os

    mesh0 = read_mesh(CIRCLE, dim=2, force_material=0)
    alpha = 0.04

    def write_inp(path, verts):
        n = len(verts)
        cells = mesh0.cells
        with open(path, "w") as f:
            f.write(f"{n} {len(cells)} 0 0 0\n")
            for i, v in enumerate(verts):
                f.write(f"{i + 1} {v[0]:.16e} {v[1]:.16e} 0\n")
            for i, c in enumerate(cells):
                f.write(f"{i + 1} 0 line {c[0] + 1} {c[1] + 1}\n")

    c, s = np.cos(alpha), np.sin(alpha)
    R_alpha = np.array([[c, -s], [s, c]])
    # an asymmetry marker is unnecessary: the FD gait velocity field of the
    # rotated frames is the rotation mode itself
    write_inp(tmp_path / "spin_0.inp", mesh0.vertices[:, :2])
    write_inp(tmp_path / "spin_1.inp", mesh0.vertices[:, :2] @ R_alpha.T)

    from bemstokes_tpu.swimmer import SwimmerSimulation

    cfg = ProblemConfig(
        dim=2,
        input_grid_path=f"{tmp_path}/",
        input_grid_base_name="spin_",
        input_grid_format="inp",
        n_frames=2,
        time_step=0.1,
        grid_type="Real",
        force_pole="Origin",
        consider_rigid_rotations=True,
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    hist = sim.run(0, 1)
    U = np.asarray(hist[0]["rigid_velocities"])
    omega_exact = -alpha / cfg.time_step
    assert abs(U[2] - omega_exact) / abs(omega_exact) < 2e-2, U
    assert np.max(np.abs(U[:2])) < 1e-6 * abs(omega_exact)
    # the body rotation state advanced by omega*dt ~ -alpha
    ang = np.arctan2(sim.state.rotation[1, 0], sim.state.rotation[0, 0])
    assert abs(ang - cfg.time_step * U[2]) < 1e-12
    # and the accumulated counter-rotation cancels the gait rotation in the
    # lab frame: euler_for_frame(1) = R_state . (gait frame 1) ~ frame 0
    e1 = np.asarray(sim.euler_for_frame(1))
    expected = (mesh0.vertices[:, :2] @ R_alpha.T) @ sim.state.rotation.T
    assert np.max(np.abs(np.sort(e1, axis=0) - np.sort(expected, axis=0))) < 1e-9
    assert (
        np.max(
            np.abs(
                np.sort(e1, axis=0) - np.sort(mesh0.vertices[:, :2], axis=0)
            )
        )
        < 2e-3
    )
