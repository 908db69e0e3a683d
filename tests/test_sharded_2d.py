"""2D (dim=2) problems through the DISTRIBUTED frame step: the sharded
assembly/corrections/LU path is dimension-generic (the reference builds
`bem_stokes_2d` with identical MPI row maps), so the rotating-circle solve
must match single-chip on the 8-virtual-device mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step

CIRCLE = "/root/reference/tests/grid_test/circle_0.inp"


def test_distributed_circle_rotation_matches_single_chip():
    mesh = read_mesh(CIRCLE, dim=2, force_material=0)
    mesh = refine_uniform(mesh, SphericalManifold((0.0, 0.0)), times=3)
    cfg = ProblemConfig(
        dim=2,
        grid_type="ImposedVelocity",
        imposed_component=2,  # the single 2D rotation mode
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.num_rigid == 3
    euler = prob.initial_euler()
    sdot = jnp.zeros((2 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)
    F_ref = np.asarray(res_ref["rigid_forces_pole"])

    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    U, _, info, fields = step(euler, sdot)
    assert int(info["iterations"]) <= 2
    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7

    F = np.asarray(fields["F"])
    assert np.abs(F - F_ref).max() / np.abs(F_ref).max() < 1e-7
    # rotating unit circle: T = 4 pi mu omega a^2 (no Stokes paradox for
    # rotation; same anchor as test_2d_problem, tol matches its 2e-3)
    T_exact = 4.0 * np.pi
    assert abs(abs(F[2]) - T_exact) / T_exact < 2e-3
