"""Wall/box factory tests + mixed-BC solve with an enclosing box (reference
analogs: `tests/alpha_test.cc` with `parameters_test_alpha_box.prm`,
`tests/stokeselet_box_test.cc`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig, WallConfig
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.factories import create_wall, create_box, add_walls_to_mesh
from bemstokes_tpu.mesh.surface_mesh import (
    MATERIAL_WALL_NO_SLIP,
    MATERIAL_WALL_FREE_SURFACE,
)
from bemstokes_tpu.fem.geometry import (
    euler_from_mesh,
    panel_geometry,
    make_tables,
)
from bemstokes_tpu.fem.quadrature import gauss_quad
from bemstokes_tpu.problem import StokesBEMProblem


def wall_geometry(mesh):
    space = build_scalar_space(mesh, 1)
    pts, wts = gauss_quad(3)
    tab = make_tables(2, 1, 1, pts, wts)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    flip = jnp.where(jnp.asarray(mesh.flip_normal), -1.0, 1.0)
    return panel_geometry(
        euler[jnp.asarray(space.cells_nodes)],
        jnp.asarray(tab.phi_map),
        jnp.asarray(tab.dphi_map),
        jnp.asarray(tab.weights),
        flip,
        ambient_dim=3,
    )


def test_wall_normal_points_to_origin():
    # wall above the origin (y = +5): normal must point down (-y)
    w = create_wall((0.0, 5.0, 0.0), (10.0, 0.0, 10.0), "no_slip")
    assert w.n_cells == 4  # one refinement
    assert np.all(w.material_id == MATERIAL_WALL_NO_SLIP)
    _, normals, jxw = wall_geometry(w)
    assert np.allclose(np.asarray(normals)[..., 1], -1.0, atol=1e-12)
    assert abs(float(jnp.sum(jxw)) - 20.0 * 20.0) < 1e-10
    # wall below: normal points up; flipped wall below: down again
    w2 = create_wall((0.0, -5.0, 0.0), (10.0, 0.0, 10.0), "free_surface")
    _, normals2, _ = wall_geometry(w2)
    assert np.allclose(np.asarray(normals2)[..., 1], 1.0, atol=1e-12)
    w3 = create_wall(
        (0.0, -5.0, 0.0), (10.0, 0.0, 10.0), "free_surface", flip_normal=True
    )
    _, normals3, _ = wall_geometry(w3)
    assert np.allclose(np.asarray(normals3)[..., 1], -1.0, atol=1e-12)


def box_walls(half=8.0):
    return [
        WallConfig(True, "no_slip", (0.0, half, 0.0), (half, 0.0, half)),
        WallConfig(True, "no_slip", (0.0, -half, 0.0), (half, 0.0, half)),
        WallConfig(True, "no_slip", (0.0, 0.0, half), (half, half, 0.0)),
        WallConfig(True, "no_slip", (0.0, 0.0, -half), (half, half, 0.0)),
        WallConfig(True, "no_slip", (half, 0.0, 0.0), (0.0, half, half)),
        WallConfig(True, "no_slip", (-half, 0.0, 0.0), (0.0, half, half)),
    ]


def test_box_closed_and_oriented():
    box = create_box(box_walls(8.0))
    xq, normals, jxw = wall_geometry(box)
    a = 16.0
    assert abs(float(jnp.sum(jxw)) - 6 * a * a) < 1e-9
    # normals point inward (toward origin): volume integral is negative
    vol = float(jnp.sum(jnp.sum(xq * normals, -1) * jxw) / 3.0)
    assert abs(vol + a**3) < 1e-9, vol


def test_sphere_in_box_solid_angle_and_solve(reference_grid_dir):
    """Sphere swimmer enclosed in a no-slip box: the solid-angle correction
    must still give K e = e, and the monolithic Real solve must recover the
    imposed translation (reference alpha_test-with-box family)."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        walls=tuple(box_walls(8.0)),
        create_box=True,
        solver=SolverConfig(solve_directly=True),
    )
    full_mesh = add_walls_to_mesh(mesh, cfg)
    assert full_mesh.n_cells == 96 + 6 * 4
    prob = StokesBEMProblem(full_mesh, cfg)
    # walls contribute wall BC sets; body nodes only on the sphere
    assert prob.body_node_mask.sum() == 98

    euler0 = prob.initial_euler()
    mesh1_full = add_walls_to_mesh(mesh1, cfg)
    euler1 = jnp.asarray(euler_from_mesh(mesh1_full.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)
    res = prob.solve_frame(euler0, sdot)
    d = res["diagnostics"]
    assert np.allclose(d["k_solid_angle_check"], 1.0, atol=1e-10)
    U = res["rigid_velocities"]
    exact = (1.0 / 120.0) / cfg.time_step
    # the box at distance 8 perturbs the drag slightly; the swimmer velocity
    # is still the imposed translation to a few percent
    assert abs(U[0] - exact) / exact < 5e-2, (U, exact)
    assert res["residual"] < 1e-8


def test_cylinder_apply_manifold_gate():
    """cylinder.apply_manifold gates the CylindricalManifold snap during
    refinement (reference `cylinder_manifold_bool`,
    `source/bem_stokes.cc:334, 794-806`)."""
    import numpy as np
    from bemstokes_tpu.mesh.factories import create_cylindrical_wall

    on = create_cylindrical_wall(
        radius=1.0, height=2.0, refinements=1, apply_manifold=True
    )
    off = create_cylindrical_wall(
        radius=1.0, height=2.0, refinements=1, apply_manifold=False
    )
    r_on = np.linalg.norm(on.vertices[:, :2], axis=1)
    r_off = np.linalg.norm(off.vertices[:, :2], axis=1)
    assert np.allclose(r_on, 1.0, atol=1e-12)  # snapped onto the cylinder
    assert np.min(r_off) < 1.0 - 1e-3  # chord midpoints stay inside
