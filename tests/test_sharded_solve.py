"""Distributed frame step (8 virtual devices) vs the single-chip pipeline:
identical rigid velocities for the sphere-translation configuration."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step


def test_sharded_frame_step_matches_single_chip(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(grid_type="Real", force_pole="Origin")
    prob = StokesBEMProblem(mesh, cfg)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)

    # single-chip
    res = prob.solve_frame(euler0, sdot)
    U_ref = res["rigid_velocities"]

    # 8-device sharded step
    dmesh = row_mesh()
    step = make_sharded_frame_step(prob, dmesh)
    U, euler_next, info = step(euler0, sdot)
    U = np.asarray(U)
    assert np.allclose(U, U_ref, atol=1e-7), (U, U_ref)
    exact = (1.0 / 120.0) / cfg.time_step
    assert abs(U[0] - exact) / exact < 2e-2
    # euler advanced by dt * U
    assert np.allclose(
        np.asarray(euler_next),
        np.asarray(euler0) + cfg.time_step * U[None, :3],
        atol=1e-12,
    )
