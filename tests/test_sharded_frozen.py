"""Frozen-geometry squirmer fast path on the DISTRIBUTED step: after one
full step, later frames reuse the device-resident operators + LU factors and
only rebuild the rhs (reference squirmer branch skipping re-assembly,
`source/bem_stokes.cc:5734-5759`), matching both the full distributed
re-assembly and the single-chip frozen solve."""

import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.fem.geometry import euler_from_mesh
from bemstokes_tpu.physics.rigid import flatten
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step
from bemstokes_tpu.swimmer import SwimmerSimulation

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def _squirmer_slip(mesh, B1=1.0):
    space = build_scalar_space(mesh, 1)
    euler = euler_from_mesh(mesh.vertices, space)
    rhat = euler / np.linalg.norm(euler, axis=1, keepdims=True)
    e = np.array([1.0, 0.0, 0.0])
    slip = B1 * ((rhat @ e)[:, None] * rhat - e[None, :])
    return np.asarray(flatten(jnp.asarray(slip)))


def test_frozen_step_matches_full_step():
    mesh = read_mesh(SPHERE, dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        velocity_type="Squirmer",
        squirmer_change_geometry=False,
        consider_rigid_displacements=False,
        consider_rigid_rotations=False,
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    sdot0 = jnp.asarray(_squirmer_slip(mesh, B1=1.0))
    sdot1 = jnp.asarray(_squirmer_slip(mesh, B1=-0.5))

    step = make_sharded_frame_step(
        prob, row_mesh(), return_fields=True, keep_frozen_pieces=True
    )
    U0, _, info0, _ = step(euler, sdot0)
    # frozen re-solve with a DIFFERENT gait velocity
    Uf, _, info_f, fields_f = step.frozen(sdot1)
    # oracle: full re-assembled step at the same geometry/velocity
    U1, _, info1, fields_1 = step(euler, sdot1)
    assert np.allclose(np.asarray(Uf), np.asarray(U1), atol=1e-9)
    forces_f = np.asarray(fields_f["forces"])
    forces_1 = np.asarray(fields_1["forces"])
    scale = max(np.abs(forces_1).max(), 1e-30)
    assert np.abs(forces_f - forces_1).max() / scale < 1e-9
    # Lighthill/Blake: U = (2/3) B1 e_x for this slip convention
    # (B1((e.r)r - e) is -B1 sin(theta) theta_hat)
    assert np.asarray(Uf)[0] == pytest.approx(2.0 / 3.0 * (-0.5), rel=2e-2)
    # frozen solve reuses the factors (no refactor happened)
    assert step.stale_state["refactored"] is False


def test_distributed_squirmer_swimmer_uses_frozen(tmp_path):
    """SwimmerSimulation with distributed=True routes frozen squirmer frames
    through the device-resident fast path and matches the single-chip loop."""
    for f in (0, 1):
        shutil.copy(SPHERE, tmp_path / f"squirmer_{f}.msh")
    mesh = read_mesh(SPHERE, dim=3)
    sdot = _squirmer_slip(mesh)
    for f in (0, 1):
        np.save(tmp_path / f"squirming_velocity_{f}.npy", sdot)

    base = dict(
        grid_type="Real",
        force_pole="Origin",
        n_frames=2,
        input_grid_path=f"{tmp_path}/",
        input_grid_base_name="squirmer_",
        input_grid_format="msh",
        input_velocity_path=f"{tmp_path}/",
        velocity_type="Squirmer",
        squirmer_change_geometry=False,
        consider_rigid_displacements=False,
        consider_rigid_rotations=False,
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    hist_ref = SwimmerSimulation(
        ProblemConfig(**base), str(tmp_path / "single")
    ).run(0, 2)
    sim = SwimmerSimulation(
        ProblemConfig(**base, distributed=True), str(tmp_path / "dist")
    )
    hist = sim.run(0, 2)
    assert getattr(sim._dist_step, "frozen", None) is not None
    for h, h_ref in zip(hist, hist_ref):
        np.testing.assert_allclose(
            h["rigid_velocities"], h_ref["rigid_velocities"], atol=1e-8
        )
    # swimming speed: U = (2/3) B1 along x on both frames
    assert hist[1]["rigid_velocities"][0] == pytest.approx(
        2.0 / 3.0, rel=2e-2
    )
