"""Parity tests for the reference's torus / spiral / origin-rigid-mode
families: `tests/baricenter_torus.cc` (surface mass + center of mass of the
120-frame torus gait about the Origin pole), `tests/origin_rigid_modes.cc`
(rigid modes about the origin equal the exact parsed functions), and
`tests/motility_spiral.cc` (the 120-frame helical-spiral gait swims).

Golden anchors from `tests/baricenter_torus.output`: total surface measure
1364.41 and center-of-mass ~= 0 for `grid_test/torus_0.inp`.
"""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables
from bemstokes_tpu.physics.rigid import (
    build_mass_operator,
    surface_mass_and_com,
    rigid_modes,
)
from bemstokes_tpu.swimmer import SwimmerSimulation

GRID = "/root/reference/tests/grid_test"


def test_torus_barycenter_and_mass():
    """`baricenter_torus.cc`: mass(torus_0) = 1364.41, CoM = origin."""
    mesh = read_mesh(f"{GRID}/torus_0.inp", dim=3)
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig(quad_order=4, dtype=jnp.float64)
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    _, (xq, _, jxw) = build_mass_operator(euler, tables)
    mass, com = surface_mass_and_com(xq, jxw)
    # golden `baricenter_torus.output:7`: 1364.41 on the same Q1 mesh
    assert abs(float(mass) - 1364.41) / 1364.41 < 2e-3
    # golden CoM ~ (4e-13, -5e-8, -1e-8); torus radius ~12
    assert np.max(np.abs(np.asarray(com))) < 1e-4


def test_origin_rigid_modes_exact():
    """`origin_rigid_modes.cc`: about pole=0 the six modes are exactly
    (1,0,0),(0,1,0),(0,0,1),(0,-z,y),(z,0,-x),(-y,x,0)."""
    mesh = read_mesh(f"{GRID}/torus_0.inp", dim=3)
    space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = np.asarray(support_points(euler, space, space))
    N = np.asarray(rigid_modes(jnp.asarray(sp), jnp.zeros(3)))
    x, y, z = sp[:, 0], sp[:, 1], sp[:, 2]
    zero = np.zeros_like(x)
    one = np.ones_like(x)
    exact = np.stack(
        [
            np.stack([one, zero, zero], -1),
            np.stack([zero, one, zero], -1),
            np.stack([zero, zero, one], -1),
            np.stack([zero, -z, y], -1),
            np.stack([z, zero, -x], -1),
            np.stack([-y, x, zero], -1),
        ]
    )
    assert np.max(np.abs(N - exact)) < 1e-12


def test_spiral_gait_swims(tmp_path):
    """`motility_spiral.cc` analog: two frames of the 120-frame helical
    spiral gait produce a nonzero force-free swimming velocity with finite
    invariant diagnostics, and consecutive frames agree in magnitude (the
    gait is a steady traveling wave)."""
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Baricenter",
        n_frames=120,
        input_grid_path=f"{GRID}/",
        input_grid_base_name="spiral_",
        input_grid_format="msh",
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, output_dir=str(tmp_path))
    hist = sim.run(0, 2)
    U0 = np.asarray(hist[0]["rigid_velocities"], dtype=float)
    U1 = np.asarray(hist[1]["rigid_velocities"], dtype=float)
    assert np.all(np.isfinite(U0)) and np.all(np.isfinite(U1))
    # the wave swims: nonzero translation, steady between frames (measured
    # s0/s1 = 1.0027 — the gait really is a steady traveling wave)
    s0, s1 = np.linalg.norm(U0[:3]), np.linalg.norm(U1[:3])
    assert s0 > 1e-6 and s1 > 1e-6
    assert 0.95 < s0 / s1 < 1.05
