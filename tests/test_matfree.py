"""Matrix-free (assembly-fused) monolithic GMRES vs the materialized path.

The matrix-free operator (bemstokes_tpu.matfree) recomputes the smooth bulk
inside the GMRES matvec and applies the exact sparse / low-rank / diagonal
corrections functionally; every configuration here must match the
materialized solve to 1e-7 (VERDICT r4 ask #1).  The Pallas fused-matvec
kernel itself is validated against the XLA fallback in interpreter mode for
all three Green's functions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import (
    ProblemConfig,
    SolverConfig,
    WallConfig,
    WallRefinementConfig,
)
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.mesh.factories import add_walls_to_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh

SPHERE0 = "/root/reference/tests/grid_test/sphere_translation_0.msh"
SPHERE1 = "/root/reference/tests/grid_test/sphere_translation_1.msh"
BACTERIUM = "/root/reference/tests/grid_test/bacterium_0.msh"


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


def _solve_pair(mesh, cfg_kwargs, sdot_fn=None, mesh_ops=None):
    """Solve the same frame materialized and matrix-free; return both."""
    results = []
    for mf in (False, True):
        cfg = ProblemConfig(
            solver=SolverConfig(
                preconditioner_type="Direct", tolerance=1e-11
            ),
            matrix_free=mf,
            matfree_block_nodes=64,
            **cfg_kwargs,
        )
        m = mesh
        if mesh_ops is not None:
            m = mesh_ops(m, cfg)
        prob = StokesBEMProblem(m, cfg)
        euler = prob.initial_euler()
        if sdot_fn is None:
            sdot = jnp.zeros((prob.dim * prob.n,))
        else:
            sdot = sdot_fn(prob, euler)
        results.append(prob.solve_frame(euler, sdot))
    return results


def _check_pair(res_mat, res_mf, tol=1e-7):
    assert _rel(res_mf["rigid_velocities"], res_mat["rigid_velocities"]) < tol
    assert _rel(res_mf["stokes_forces"], res_mat["stokes_forces"]) < tol
    dm, df = res_mat["diagnostics"], res_mf["diagnostics"]
    assert _rel(df["v_null_residual_pre"], dm["v_null_residual_pre"]) < 1e-9
    assert np.allclose(
        np.asarray(df["k_solid_angle_check"]),
        np.asarray(dm["k_solid_angle_check"]),
        atol=1e-9,
    )
    # the matrix-free finish reports the TRUE residual of the implicit
    # operator; the solve must actually have converged
    assert res_mf["converged"]


def test_matfree_sphere_translation():
    """Real-grid translating sphere: U, forces, diagnostics match to 1e-7
    and the known velocity is recovered."""
    mesh = read_mesh(SPHERE0, dim=3)
    mesh1 = read_mesh(SPHERE1, dim=3)

    def sdot_fn(prob, euler):
        euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
        return prob.shape_velocities_fd(euler, euler1)

    res_mat, res_mf = _solve_pair(
        mesh, dict(grid_type="Real", force_pole="Origin"), sdot_fn
    )
    _check_pair(res_mat, res_mf)
    exact = (1.0 / 120.0) / 0.1
    assert abs(res_mf["rigid_velocities"][0] - exact) / exact < 2e-2


def test_matfree_imposed_force_adaptive():
    """ImposedForce mobility solve WITH adaptive quadrature (near-pair COO
    deltas in the implicit operator)."""
    from bemstokes_tpu.config import QuadratureConfig

    mesh = read_mesh(SPHERE0, dim=3)
    res_mat, res_mf = _solve_pair(
        mesh,
        dict(
            grid_type="ImposedForce",
            imposed_component=0,
            force_pole="Origin",
            quadrature=QuadratureConfig(order=4, order_far=2, near_panels=8),
        ),
    )
    _check_pair(res_mat, res_mf)


def test_matfree_hanging_nodes_walls():
    """The Lorentz refined-wall configuration: hanging-node constraints,
    resolved no-slip wall, component-restricted solid angle, and
    ImposedVelocity tail — all through the implicit operator."""
    H = 2.0
    cfg_kwargs = dict(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        body_manifold="sphere",
        alpha_row_sum="component",
        walls=(
            WallConfig(
                enabled=True,
                wall_type="no_slip",
                position=(0.0, -H, 0.0),
                span=(12.0, 0.0, 12.0),
            ),
        ),
        wall_refinement=WallRefinementConfig(
            enabled=True, threshold=1.0, distance_from_center=6.0
        ),
    )

    def mesh_ops(m, cfg):
        m = refine_uniform(m, SphericalManifold(), times=1)
        return add_walls_to_mesh(m, cfg)

    mesh = read_mesh(SPHERE0, dim=3)
    res_mat, res_mf = _solve_pair(mesh, cfg_kwargs, mesh_ops=mesh_ops)
    _check_pair(res_mat, res_mf)


def test_matfree_free_surface_kernel():
    """reflect_kernel (free-surface image Green's function) through the
    fused matvec's image fold."""
    mesh = read_mesh(SPHERE0, dim=3)
    mesh1 = read_mesh(SPHERE1, dim=3)

    def sdot_fn(prob, euler):
        euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
        return prob.shape_velocities_fd(euler, euler1)

    res_mat, res_mf = _solve_pair(
        mesh,
        dict(
            grid_type="Real",
            force_pole="Origin",
            reflect_kernel=True,
            walls=(
                WallConfig(
                    enabled=True,
                    wall_type="free_surface",
                    position=(0.0, -2.0, 0.0),
                    span=(0.0, 0.0, 0.0),
                ),
            ),
        ),
        sdot_fn,
    )
    _check_pair(res_mat, res_mf)


def test_matfree_torque():
    """solve_with_torque: the motor-torque row/column ride the bordered
    Schur tail of the matrix-free preconditioner."""
    mesh = read_mesh(BACTERIUM, dim=3, force_material=0)
    res_mat, res_mf = _solve_pair(
        mesh, dict(grid_type="Real", force_pole="Origin", solve_with_torque=True)
    )
    _check_pair(res_mat, res_mf)
    assert res_mf["flagellum_omega"] == pytest.approx(
        res_mat["flagellum_omega"], rel=1e-7
    )
    assert res_mf["motor_torque"] == pytest.approx(-2.0, rel=1e-7)


@pytest.mark.parametrize("kernel", ["free_space", "free_surface", "no_slip"])
def test_pallas_matvec_kernel_parity(kernel):
    """The Pallas fused-matvec kernel (interpret mode) against the XLA
    fallback for all three Green's functions, f32."""
    from bemstokes_tpu.ops.assemble import (
        AssemblyConfig,
        build_assembly_tables,
    )
    from bemstokes_tpu.ops.matfree_node import build_sweep, sweep_matvec
    from bemstokes_tpu.fem.geometry import panel_geometry, support_points
    from bemstokes_tpu.mesh import build_scalar_space

    mesh = read_mesh(SPHERE0, dim=3)
    space = build_scalar_space(mesh, 1)
    acfg = AssemblyConfig(
        dim=3,
        kernel=kernel,
        wall_axis=1,
        wall_position=-2.0,
        dtype=jnp.float32,
        backend="pallas_interpret",
    )
    tables = build_assembly_tables(space, space, acfg)
    euler = jnp.asarray(mesh.vertices, jnp.float32)
    sp = support_points(euler, space, space)
    xq, normals, jxw = panel_geometry(
        euler[jnp.asarray(tables.cells_nodes_map)],
        jnp.asarray(tables.phi_map, jnp.float32),
        jnp.asarray(tables.dphi_map, jnp.float32),
        jnp.asarray(tables.q_weights, jnp.float32),
        jnp.asarray(tables.flip_sign, jnp.float32),
        ambient_dim=3,
    )
    rng = np.random.default_rng(7)
    n = tables.n_nodes
    XV = jnp.asarray(rng.standard_normal((3 * n, 2)), jnp.float32)
    XK = jnp.asarray(rng.standard_normal((3 * n, 3)), jnp.float32)

    st_p, arrs_p = build_sweep(
        tables, sp, xq, normals, jxw, backend="pallas_interpret"
    )
    st_x, arrs_x = build_sweep(tables, sp, xq, normals, jxw, backend="xla")
    Vp, Kp = sweep_matvec(st_p, arrs_p, XV, XK)
    Vx, Kx = sweep_matvec(st_x, arrs_x, XV, XK)
    assert _rel(Vp, Vx) < 2e-5
    assert _rel(Kp, Kx) < 2e-5


def test_split_f64_gemv():
    """The TPU split-precision GEMV (la/mixed.py) against the true f64
    product: representation split exact to ~eps_f32^2, chunked f64
    accumulation (on CPU the XLA f32 dot already accumulates pairwise, so
    the tolerance checks the formulation, not the TPU win — the on-chip
    numbers (1.0e-7 vs plain-f32 1.5e-7 at n=8192, plain-f32 speed, no
    8x-n^2 emulation copies) are recorded in la/mixed.py)."""
    from bemstokes_tpu.la.mixed import split_f64, split_gemv

    rng = np.random.default_rng(5)
    n, m = 700, 1100  # non-multiple of the chunk: exercises padding
    A = jnp.asarray(rng.standard_normal((n, m)))
    v = jnp.asarray(rng.standard_normal(m))
    Ah, Al = split_f64(A, chunk=256)
    y = split_gemv(Ah, Al, v, chunk=256)
    y0 = A @ v
    assert float(jnp.linalg.norm(y - y0) / jnp.linalg.norm(y0)) < 1e-6
    # split is exact: hi + lo reconstructs A to f64
    assert float(
        jnp.abs(Ah[:, :m].astype(jnp.float64) + Al[:, :m].astype(jnp.float64) - A).max()
    ) < 1e-12
