"""In-code geometry factories (`build_sphere_in_code`, `two_spheres`,
reference `source/bem_stokes.cc:670-711`) and the squirmer frozen-geometry
fast path (`squirmer_change_geometry=false`, `:5734-5759`, `:5904`)."""

import shutil

import numpy as np
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh.factories import create_sphere, create_body_in_code
from bemstokes_tpu.swimmer import SwimmerSimulation


def _areas_and_normal_dots(mesh):
    import jax.numpy as jnp

    from bemstokes_tpu.mesh import build_scalar_space
    from bemstokes_tpu.fem.geometry import euler_from_mesh, panel_geometry
    from bemstokes_tpu.fem.reference_element import reference_element
    from bemstokes_tpu.fem.quadrature import gauss_quad

    sp = build_scalar_space(mesh, 1)
    e = jnp.asarray(euler_from_mesh(mesh.vertices, sp))
    me = reference_element(2, 1)
    pts, wts = gauss_quad(3)
    xq, nrm, jxw = panel_geometry(
        e[jnp.asarray(sp.cells_nodes)],
        jnp.asarray(me.shape_values(pts)),
        jnp.asarray(me.shape_grads(pts)),
        jnp.asarray(wts),
        jnp.asarray(np.where(mesh.flip_normal, -1.0, 1.0)),
        ambient_dim=3,
    )
    return np.asarray(xq), np.asarray(nrm), float(np.asarray(jxw).sum())


def test_create_sphere_outward_normals_and_area():
    mesh = create_sphere(refinements=2)
    xq, nrm, area = _areas_and_normal_dots(mesh)
    r = xq.reshape(-1, 3)
    dots = (nrm.reshape(-1, 3) * (r / np.linalg.norm(r, axis=1, keepdims=True))).sum(1)
    assert dots.min() > 0.9  # outward everywhere (file-mesh convention)
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.04
    # refinement converges the area
    finer = create_sphere(refinements=3)
    _, _, area3 = _areas_and_normal_dots(finer)
    assert abs(area3 - 4 * np.pi) < abs(area - 4 * np.pi) / 3


def test_two_spheres_factory():
    cfg = ProblemConfig(
        build_sphere_in_code=True,
        two_spheres=True,
        spheres_distance=3.0,
        internal_sphere_refinements=1,
    )
    mesh = create_body_in_code(cfg)
    one = create_sphere(refinements=1)
    assert mesh.n_cells == 2 * one.n_cells
    # second sphere centered at (distance, 0, 0)
    x = mesh.vertices[:, 0]
    assert abs(x.min() + 1.0) < 1e-12 and abs(x.max() - 4.0) < 1e-12
    assert np.all(mesh.material_id == 0)


def test_build_sphere_in_code_mobility(tmp_path):
    """End-to-end: ImposedVelocity mobility solve on the in-code sphere
    recovers the Stokes drag 6 pi mu R U (coarse-mesh tolerance)."""
    import jax.numpy as jnp

    from bemstokes_tpu.problem import StokesBEMProblem

    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        build_sphere_in_code=True,
        internal_sphere_refinements=2,
        body_manifold="sphere",
        solver=SolverConfig(solve_directly=True),
    )
    mesh = create_body_in_code(cfg)
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(
        prob.initial_euler(), jnp.zeros((3 * prob.n,), jnp.float64)
    )
    from bemstokes_tpu.physics.rigid import flatten
    import jax

    N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
    F = np.asarray(N_dual_flat @ res["stokes_forces"])
    assert abs(abs(F[0]) - 6 * np.pi) / (6 * np.pi) < 2e-2


@pytest.fixture()
def squirmer_dir(tmp_path, reference_grid_dir):
    """A 2-frame frozen-geometry squirmer gait: both frames are the same
    sphere mesh, with B1-squirmer slip velocity files."""
    import jax.numpy as jnp

    from bemstokes_tpu.mesh import read_mesh, build_scalar_space
    from bemstokes_tpu.fem.geometry import euler_from_mesh
    from bemstokes_tpu.physics.rigid import flatten

    src = f"{reference_grid_dir}/sphere_translation_0.msh"
    for f in (0, 1):
        shutil.copy(src, tmp_path / f"squirmer_{f}.msh")
    mesh = read_mesh(src, dim=3)
    space = build_scalar_space(mesh, 1)
    euler = euler_from_mesh(mesh.vertices, space)
    rhat = euler / np.linalg.norm(euler, axis=1, keepdims=True)
    e = np.array([1.0, 0.0, 0.0])
    B1 = 1.0
    # tangential squirmer slip u_s = B1 sin(theta) theta_hat
    #                             = B1 ((e . rhat) rhat - e)
    slip = B1 * ((rhat @ e)[:, None] * rhat - e[None, :])
    sdot = np.asarray(flatten(jnp.asarray(slip)))
    for f in (0, 1):
        np.save(tmp_path / f"squirming_velocity_{f}.npy", sdot)
    return tmp_path


def _squirmer_cfg(squirmer_dir, **kw):
    defaults = dict(
        grid_type="Real",
        force_pole="Origin",
        n_frames=2,
        input_grid_path=f"{squirmer_dir}/",
        input_grid_base_name="squirmer_",
        input_grid_format="msh",
        input_velocity_path=f"{squirmer_dir}/",
        velocity_type="Squirmer",
        consider_rigid_displacements=False,
        consider_rigid_rotations=False,
        solver=SolverConfig(solve_directly=True),
    )
    defaults.update(kw)
    return ProblemConfig(**defaults)


def test_squirmer_frozen_fast_path(squirmer_dir, tmp_path):
    """squirmer_change_geometry=false skips re-assembly after the first
    frame and matches the full re-assembled solve; the swimming speed matches
    Lighthill/Blake U = (2/3) B1 along the squirmer axis."""
    out_a = tmp_path / "frozen"
    out_b = tmp_path / "full"
    sim_a = SwimmerSimulation(
        _squirmer_cfg(squirmer_dir, squirmer_change_geometry=False),
        output_dir=str(out_a),
    )
    hist_a = sim_a.run(0, 2)
    sim_b = SwimmerSimulation(
        _squirmer_cfg(squirmer_dir, squirmer_change_geometry=True),
        output_dir=str(out_b),
    )
    hist_b = sim_b.run(0, 2)

    U_a = np.asarray(hist_a[1]["rigid_velocities"])
    U_b = np.asarray(hist_b[1]["rigid_velocities"])
    # frame 1 used the frozen fast path in sim_a; same geometry -> same result
    assert np.allclose(U_a, U_b, atol=1e-8)

    # physics: |U| = 2/3 B1 along x (coarse 98-node mesh tolerance)
    speed = abs(U_a[0])
    assert abs(speed - 2.0 / 3.0) / (2.0 / 3.0) < 5e-2, U_a
    assert np.max(np.abs(U_a[1:])) < 5e-3 * speed


def test_squirmer_reads_dealii_block_bin(squirmer_dir, tmp_path):
    """Squirmer IO parity: the reference reads
    `<input_velocity_path><basename><dim>d_frame_<frame>.bin` in deal.II
    block_write binary (`source/bem_stokes.cc:2124-2133`); the `.bin` file
    must take precedence over a `.npy` sibling and give identical physics."""
    from bemstokes_tpu.utils.dealii_io import block_read, block_write

    bin_dir = tmp_path / "vel_bin"
    bin_dir.mkdir()
    for f in (0, 1):
        sdot = np.load(squirmer_dir / f"squirming_velocity_{f}.npy")
        block_write(bin_dir / f"squirming_velocity_3d_frame_{f}.bin", sdot)
        # roundtrip sanity
        assert np.array_equal(
            block_read(bin_dir / f"squirming_velocity_3d_frame_{f}.bin"), sdot
        )
        # a poisoned npy sibling: the reference-format bin must win
        np.save(bin_dir / f"squirming_velocity_{f}.npy", 0.0 * sdot)

    sim = SwimmerSimulation(
        _squirmer_cfg(squirmer_dir, input_velocity_path=f"{bin_dir}/"),
        output_dir=str(tmp_path / "out"),
    )
    hist = sim.run(0, 1)
    U = np.asarray(hist[0]["rigid_velocities"])
    speed = abs(U[0])
    assert abs(speed - 2.0 / 3.0) / (2.0 / 3.0) < 5e-2, U
