"""Two reference test families previously without analogs:

- `V_test_with_Green_cube.cc` (+ Q2/2D siblings): fundamental-solution
  recovery on a CLOSED CUBE — sharp edges and corners exercise the L2
  normal projection and solid-angle correction off the smooth-surface case.
- `imposed_rotation_test_on_dilated_sphere.cc`: unit imposed torque on a
  radius-L sphere translated far from the origin must recover
  omega = T / (8 pi mu L^3) about the Baricenter pole (reference tol 3e-2,
  L = 10, shift +34.913639)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.factories import create_cube
from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh
from bemstokes_tpu.problem import StokesBEMProblem

from test_green_recovery import green_recovery_error


def test_green_recovery_cube_converges():
    cube1 = create_cube(refinements=2)  # 96 cells
    cube2 = create_cube(refinements=3)  # 384 cells
    src = (0.2, 0.1, 0.3)
    e1 = green_recovery_error(cube1, 3, src, quad_order=5, sing_order=9)
    e2 = green_recovery_error(cube2, 3, src, quad_order=5, sing_order=9)
    # corners limit the rate vs the smooth sphere; the error must still
    # drop markedly under refinement and be small in absolute terms
    assert e1 < 0.25, e1
    assert e2 < 0.75 * e1, (e1, e2)


def test_cube_factory_geometry():
    cube = create_cube(refinements=2, half_width=1.0)
    V = cube.vertices
    # every vertex on the surface of [-1, 1]^3
    assert np.allclose(np.abs(V).max(axis=1), 1.0)
    # closed surface: area -> 24 under flat refinement (exact for a cube)
    from bemstokes_tpu.mesh.surface_mesh import cell_components_and_closedness

    lab, closed = cell_components_and_closedness(cube)
    assert closed.tolist() == [True]


def test_dilated_sphere_imposed_torque(reference_grid_dir):
    """Imposed unit torque about x on a radius-10 sphere far from the
    origin: omega = T / (8 pi L^3) about the Baricenter pole."""
    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_half_refined_0.inp",
        dim=3,
        force_material=0,
    )
    L, shift = 10.0, 34.913639
    dilated = SurfaceMesh(
        mesh.vertices * L + shift, mesh.cells, mesh.material_id
    )
    cfg = ProblemConfig(
        grid_type="ImposedForce",
        imposed_component=3,  # torque about x
        force_pole="Baricenter",
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(dilated, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    U = np.asarray(res["rigid_velocities"])
    exact_omega = 1.0 / (8.0 * np.pi * L**3)
    assert abs(U[3] - exact_omega) / exact_omega < 3e-2, (U[3], exact_omega)
    # pure rotation response: translations and off-axis rotations vanish to
    # mesh-asymmetry level (sphere_half_refined is not exactly symmetric)
    assert np.all(np.abs(U[[0, 1, 2, 4, 5]]) < 1e-2 * abs(U[3]))


def _square_mesh(n_per_side=8, half=1.0):
    """Closed square boundary in 2D (line cells, counterclockwise) — the 2D
    'cube' of the reference's V_test_with_Green_2d_cube.cc."""
    pts = []
    t = np.linspace(-half, half, n_per_side + 1)[:-1]
    pts += [(x, -half) for x in t]                 # bottom, left -> right
    pts += [(half, y) for y in t]                  # right, bottom -> top
    pts += [(x, half) for x in -t]                 # top, right -> left
    pts += [(-half, y) for y in -t]                # left, top -> bottom
    V = np.asarray(pts)
    n = len(V)
    # CLOCKWISE traversal — the orientation convention of the reference's
    # 2D circle meshes (circle_0.inp has negative signed area), which the
    # line-cell normal follows
    cells = np.stack(
        [(np.arange(n) + 1) % n, np.arange(n)], axis=1
    ).astype(np.int32)
    return SurfaceMesh(V, cells, np.zeros(n, np.int32))


def test_green_recovery_2d_square_converges():
    sq1 = _square_mesh(8)
    sq2 = _square_mesh(16)
    src = (0.1, 0.2)
    e1 = green_recovery_error(sq1, 2, src, quad_order=8, sing_order=10)
    e2 = green_recovery_error(sq2, 2, src, quad_order=8, sing_order=10)
    assert e1 < 0.25, e1
    assert e2 < 0.75 * e1, (e1, e2)
