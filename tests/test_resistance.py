"""Non-monolithic (grand resistance matrix / D2N) solve path vs the
monolithic solve (reference `solve_system(monolithic=false)`; the two
strategies must agree on rigid velocities)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh


def test_resistance_matches_monolithic(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)

    cfg_m = ProblemConfig(
        grid_type="Real", force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob_m = StokesBEMProblem(mesh, cfg_m)
    euler0 = prob_m.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob_m.map_space))
    sdot = prob_m.shape_velocities_fd(euler0, euler1)
    U_mono = prob_m.solve_frame(euler0, sdot)["rigid_velocities"]

    cfg_r = ProblemConfig(grid_type="Real", force_pole="Origin", monolithic=False)
    prob_r = StokesBEMProblem(mesh, cfg_r)
    res = prob_r.solve_frame(euler0, sdot)
    U_res = res["rigid_velocities"]
    assert np.allclose(U_res, U_mono, atol=1e-7), (U_res, U_mono)

    # the 6x6 resistance matrix of a sphere: diagonal, R_tt ~ 6 pi a,
    # R_rr ~ 8 pi a^3 (top-left block within coarse-mesh error)
    Rm = res["resistance_matrix"]
    assert Rm.shape == (6, 6)
    for i in range(3):
        assert abs(abs(Rm[i, i]) - 6 * np.pi) / (6 * np.pi) < 0.1, Rm[i, i]
        assert abs(abs(Rm[3 + i, 3 + i]) - 8 * np.pi) / (8 * np.pi) < 0.1
    off = Rm - np.diag(np.diag(Rm))
    assert np.max(np.abs(off)) < 0.02 * 6 * np.pi


def test_resistance_imposed_force(reference_grid_dir):
    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_half_refined_0.inp", dim=3, force_material=0
    )
    cfg = ProblemConfig(
        grid_type="ImposedForce",
        imposed_component=0,
        force_pole="Origin",
        monolithic=False,
    )
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    U = res["rigid_velocities"]
    # mobility of the unit sphere
    assert abs(abs(U[0]) - 1 / (6 * np.pi)) / (1 / (6 * np.pi)) < 0.05, U
    for j in range(1, 6):
        assert abs(U[j] / U[0]) < 6e-3
