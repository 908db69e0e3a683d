"""Image-system Green's functions on the DISTRIBUTED path: the sharded
assembly inherits the kernel selection (free-surface mirror / Blake no-slip
wall) from the problem's tables, so both image solves must match single-chip
to 1e-7 on the 8-virtual-device mesh (reference runs its image kernels under
the same MPI row maps as the free-space one, `source/bem_stokes.cc:
2861-2870, 2915-2949`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig, WallConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def _image_problem(**kernel_kw):
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        walls=(
            WallConfig(
                enabled=False,  # image plane only, no wall panels
                position=(0.0, -3.0, 0.0),
                span=(10.0, 0.0, 10.0),
            ),
        ),
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
        **kernel_kw,
    )
    return StokesBEMProblem(read_mesh(SPHERE, dim=3), cfg)


@pytest.mark.parametrize(
    "kernel_kw,drag_side",
    [
        # a free surface (slip plane) REDUCES the parallel drag below the
        # free-space 6 pi; a Blake no-slip wall increases it
        (dict(reflect_kernel=True), -1),
        (dict(no_slip_kernel=True), +1),
    ],
    ids=["free_surface", "blake_no_slip"],
)
def test_distributed_image_kernels_match_single_chip(kernel_kw, drag_side):
    prob = _image_problem(**kernel_kw)
    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)
    F_ref = np.asarray(res_ref["rigid_forces_pole"])

    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    _, _, info, fields = step(euler, sdot)
    assert int(info["iterations"]) <= 2
    F = np.asarray(fields["F"])
    assert np.abs(F - F_ref).max() / np.abs(F_ref).max() < 1e-7
    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7
    # image physics sanity relative to the free-space 6 pi
    assert drag_side * (abs(F[0]) - 6 * np.pi) > 0
