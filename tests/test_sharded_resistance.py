"""Grand-resistance (non-monolithic) strategy on the DISTRIBUTED path: the
R+1 Dirichlet-to-Neumann solves run as slab-matvec GMRES preconditioned by
the distributed blocked LU of V (reference `solve_system(monolithic=false)`
on distributed vectors, `source/bem_stokes.cc:4163-4258`), matching the
single-chip resistance solve to 1e-7."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step


def test_distributed_resistance_matches_single_chip(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        monolithic=False,
        solver=SolverConfig(tolerance=1e-12),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)
    res_ref = prob.solve_frame(euler0, sdot)
    U_ref = np.asarray(res_ref["rigid_velocities"])

    # make_sharded_frame_step dispatches on cfg.monolithic
    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    U, euler_next, info, fields = step(euler0, sdot)
    U = np.asarray(U)
    assert np.abs(U - U_ref).max() / np.abs(U_ref).max() < 1e-7, (U, U_ref)
    # the LU-of-V preconditioner is (block-pivoted) exact: few iterations
    assert int(info["iterations"]) <= 5

    # resistance matrix parity + sphere physics (R_tt ~ 6 pi, R_rr ~ 8 pi)
    Rm = np.asarray(fields["resistance_matrix"])
    Rm_ref = np.asarray(res_ref["resistance_matrix"])
    assert np.abs(Rm - Rm_ref).max() / np.abs(Rm_ref).max() < 1e-7
    for i in range(3):
        assert abs(abs(Rm[i, i]) - 6 * np.pi) / (6 * np.pi) < 0.1

    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7

    # rigid advance: euler moved by dt * U on the body
    assert np.allclose(
        np.asarray(euler_next),
        np.asarray(euler0) + cfg.time_step * U[None, :3],
        atol=1e-9,
    )


def test_distributed_resistance_imposed_force(reference_grid_dir):
    """ImposedForce mobility through the distributed resistance path."""
    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_half_refined_0.inp",
        dim=3,
        force_material=0,
    )
    cfg = ProblemConfig(
        grid_type="ImposedForce",
        imposed_component=0,
        force_pole="Origin",
        monolithic=False,
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)
    step = make_sharded_frame_step(prob, row_mesh())
    U, _, info = step(euler, sdot)
    U = np.asarray(U)
    U_ref = np.asarray(res_ref["rigid_velocities"])
    assert np.abs(U - U_ref).max() / np.abs(U_ref).max() < 1e-7
    mob = 1 / (6 * np.pi)
    assert abs(abs(U[0]) - mob) / mob < 0.05
