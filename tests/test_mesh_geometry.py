"""Mesh reader + mapped-geometry tests: areas, outward orientation, node
numbering (reference analogs: surface-mass 4*pi check in
`source/bem_stokes.cc:2540-2544`, grid ingestion in `:497-523`)."""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.fem.geometry import (
    make_tables,
    panel_geometry,
    support_points,
    euler_from_mesh,
)
from bemstokes_tpu.fem.quadrature import gauss_quad


def geometry_of(mesh, map_degree=1, order=4):
    space = build_scalar_space(mesh, map_degree)
    pts, wts = gauss_quad(order)
    tab = make_tables(mesh.dim - 1, map_degree, map_degree, pts, wts)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    flip = jnp.where(jnp.asarray(mesh.flip_normal), -1.0, 1.0)
    xq, normals, jxw = panel_geometry(
        euler[jnp.asarray(space.cells_nodes)],
        jnp.asarray(tab.phi_map),
        jnp.asarray(tab.dphi_map),
        jnp.asarray(tab.weights),
        flip,
        ambient_dim=mesh.dim,
    )
    return space, euler, xq, normals, jxw


def test_cube_inp_area_and_volume(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_coarse_0.inp", dim=3)
    assert mesh.n_cells == 6
    _, _, xq, normals, jxw = geometry_of(mesh)
    a = 2.0 / np.sqrt(3.0)  # cube edge
    area = float(jnp.sum(jxw))
    assert abs(area - 6 * a * a) < 1e-7  # mesh file has 9-digit coords
    # divergence theorem: volume = (1/3) surface integral of x . n
    vol = float(jnp.sum(jnp.sum(xq * normals, -1) * jxw) / 3.0)
    assert abs(vol - a**3) < 1e-7
    assert vol > 0  # outward orientation


def test_sphere_msh_area(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    assert mesh.n_cells == 96
    _, _, xq, normals, jxw = geometry_of(mesh, order=6)
    area = float(jnp.sum(jxw))
    # bilinear panels underestimate 4 pi at this resolution by a few percent
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.05
    vol = float(jnp.sum(jnp.sum(xq * normals, -1) * jxw) / 3.0)
    assert vol > 0
    assert abs(vol - 4 * np.pi / 3) / (4 * np.pi / 3) < 0.08


def test_scalar_space_q2_counts(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_coarse_0.inp", dim=3)
    sp1 = build_scalar_space(mesh, 1)
    assert sp1.n_nodes == 8
    sp2 = build_scalar_space(mesh, 2)
    # cube surface Q2: 8 vertices + 12 edges + 6 faces = 26
    assert sp2.n_nodes == 26
    # every cell sees 9 distinct nodes
    assert sp2.cells_nodes.shape == (6, 9)
    for c in sp2.cells_nodes:
        assert len(set(c.tolist())) == 9


def test_support_points_match_node_positions(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    map_space = build_scalar_space(mesh, 1)
    fe_space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, map_space))
    sp = support_points(euler, map_space, fe_space)
    assert np.allclose(np.asarray(sp), mesh.vertices, atol=1e-12)


def test_q2_support_points_on_edges(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_coarse_0.inp", dim=3)
    map_space = build_scalar_space(mesh, 1)
    fe_space = build_scalar_space(mesh, 2)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, map_space))
    sp = np.asarray(support_points(euler, map_space, fe_space))
    assert sp.shape == (26, 3)
    # vertex nodes coincide with vertices
    assert np.allclose(sp[:8], mesh.vertices, atol=1e-12)
    # all Q2 nodes lie on the cube surface: max|coord| == a/2
    a = 2.0 / np.sqrt(3.0)
    assert np.allclose(np.max(np.abs(sp), axis=1), a / 2, atol=1e-12)


def test_manifold_snap_scoped_to_body(reference_grid_dir):
    """A body manifold on a mixed body+wall mesh must snap only body nodes;
    wall nodes keep their flat positions (ADVICE r1, geometry.py:106)."""
    import jax.numpy as jnp
    from bemstokes_tpu.config import ProblemConfig, WallConfig, SolverConfig
    from bemstokes_tpu.mesh.factories import add_walls_to_mesh
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.mesh.surface_mesh import MATERIAL_BODY

    cfg = ProblemConfig(
        body_manifold="sphere",
        walls=(WallConfig(enabled=True, position=(0.0, 2.0, 0.0),
                          span=(3.0, 0.0, 3.0)),),
        solver=SolverConfig(solve_directly=True),
    )
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh = add_walls_to_mesh(mesh, cfg)
    prob = StokesBEMProblem(mesh, cfg)
    euler = np.asarray(prob.initial_euler())
    body = prob.body_node_mask > 0
    r = np.linalg.norm(euler, axis=1)
    # body nodes on the unit sphere, wall nodes untouched (y == 2 plane)
    assert np.allclose(r[body], 1.0, atol=1e-12)
    wall = ~body
    assert np.allclose(euler[wall][:, 1], 2.0, atol=1e-12)


def test_obj_reader_round_trip(tmp_path):
    """Wavefront OBJ quads (incl. v/vt/vn face styles and usemtl groups)
    parse into the same cube as the UCD reader's lexicographic layout."""
    obj = tmp_path / "cube.obj"
    obj.write_text(
        "# unit cube, 6 quad faces\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "v 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1\n"
        "usemtl bottom\n"
        "f 1/1/1 4/2/1 3/3/1 2/4/1\n"
        "usemtl sides\n"
        "f 1//2 2//2 6//2 5//2\n"
        "f 2 3 7 6\n"
        "f 3 4 8 7\n"
        "f -5 -8 -4 -1\n"
        "usemtl top\n"
        "f 5 6 7 8\n"
    )
    mesh = read_mesh(str(obj), dim=3)
    assert mesh.n_cells == 6
    assert mesh.vertices.shape == (8, 3)
    assert set(mesh.material_id.tolist()) == {0, 1, 2}
    space = build_scalar_space(mesh, 1)
    pts, wts = gauss_quad(3)
    from bemstokes_tpu.fem.reference_element import reference_element

    me = reference_element(2, 1)
    _, _, jxw = panel_geometry(
        jnp.asarray(mesh.vertices)[jnp.asarray(space.cells_nodes)],
        jnp.asarray(me.shape_values(pts)),
        jnp.asarray(me.shape_grads(pts)),
        jnp.asarray(wts),
        jnp.ones(mesh.n_cells),
        ambient_dim=3,
    )
    assert abs(float(jxw.sum()) - 6.0) < 1e-12
