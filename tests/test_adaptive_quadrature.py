"""Adaptive two-level quadrature: dense far-field pass at a low order plus a
gathered near-pair correction to full order must reproduce the single-pass
full-order operators to far-field truncation accuracy (the distance-graded
quadrature upgrade over the reference's single global order,
`source/bem_stokes.cc:2915-2949`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, QuadratureConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
from bemstokes_tpu.problem import StokesBEMProblem

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def _ops(mesh, space, euler, sp, **kw):
    acfg = AssemblyConfig(dtype=jnp.float64, **kw)
    tables = build_assembly_tables(space, space, acfg)
    V, K = assemble_V_K(euler, sp, tables)
    return np.asarray(V), np.asarray(K)


def test_adaptive_matches_full_order_operators():
    mesh = refine_uniform(read_mesh(SPHERE, dim=3), SphericalManifold(), times=1)
    space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)
    V_full, K_full = _ops(mesh, space, euler, sp, quad_order=4)
    V_ad, K_ad = _ops(
        mesh, space, euler, sp, quad_order=4, quad_order_far=3, near_panels=64
    )
    # near pairs are bit-identical upgrades; only far-field pairs differ,
    # where order-3 Gauss is already accurate (measured 1.4e-6 max-entry)
    for full, ad in ((V_full, V_ad), (K_full, K_ad)):
        scale = np.abs(full).max()
        err = np.abs(full - ad).max() / scale
        assert err < 5e-6, err


def test_adaptive_drag_accuracy():
    """End-to-end: the adaptive pipeline must keep the sphere drag within
    1e-6 of the full-order result (accuracy criterion of BASELINE.md)."""
    from bemstokes_tpu.physics.rigid import flatten

    mesh = refine_uniform(read_mesh(SPHERE, dim=3), SphericalManifold(), times=1)

    def drag(order_far):
        cfg = ProblemConfig(
            grid_type="ImposedVelocity",
            imposed_component=0,
            force_pole="Origin",
            body_manifold="sphere",
            quadrature=QuadratureConfig(order=4, order_far=order_far),
            solver=SolverConfig(solve_directly=True),
        )
        prob = StokesBEMProblem(mesh, cfg)
        res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
        return float(
            jnp.dot(
                flatten(jnp.asarray(res["operators"]["N_dual"][0])),
                res["stokes_forces"],
            )
        )

    F_full = drag(None)
    F_ad = drag(2)
    assert F_ad == pytest.approx(F_full, rel=1e-6)
