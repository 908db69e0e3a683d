"""Fundamental-solution recovery (reference `tests/V_test_with_Green.cc` and
2D siblings): impose u = G(x - x0) e_1 from an interior Stokeslet source,
apply the Dirichlet-to-Neumann map, and compare with the exact traction trace
t = (W . n)(x - x0) e_1; the error must drop under refinement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import (
    AssemblyConfig,
    build_assembly_tables,
    assemble_V_K,
    k_solid_angle_correction,
    tangential_projector,
)
from bemstokes_tpu.ops.resistance import dirichlet_to_neumann
from bemstokes_tpu.kernels import stokeslet_G, stresslet_W, contract_normal
from bemstokes_tpu.physics.rigid import (
    build_mass_operator,
    normal_vector_l2,
    flatten,
)


def green_recovery_error(mesh, dim, source, quad_order=4, sing_order=8):
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig(
        dim=dim, quad_order=quad_order, singular_quadrature_order=sing_order
    )
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)

    mass_op, (xq, normals_q, jxw) = build_mass_operator(euler, tables)
    body_mask = jnp.ones((space.n_nodes,))
    nv = normal_vector_l2(mass_op, normals_q, jxw, body_mask)
    n_pure_f = flatten(nv["normal_pure"])
    Mn_pure_f = flatten(nv["M_normal_pure"])
    l2g = nv["l2_gamma_pure"]

    V, K = assemble_V_K(euler, sp, tables)
    K, _ = k_solid_angle_correction(K, space.n_nodes, dim)

    src = jnp.asarray(source)
    R = sp - src[None, :]
    G = stokeslet_G(R)  # [n, d, d]
    u_flat = flatten(G[:, :, 0])  # impose G column 0 as velocity
    W = stresslet_W(R)
    t_exact = contract_normal(W, -nv["normal"])[:, :, 0]  # trace with -n
    t_exact_flat = flatten(t_exact)

    f = dirichlet_to_neumann(V, K, u_flat, n_pure_f, Mn_pure_f, l2g)
    t_exact_proj = tangential_projector(t_exact_flat, n_pure_f, Mn_pure_f, l2g)
    err = jnp.linalg.norm(f - t_exact_proj) / jnp.linalg.norm(t_exact_proj)
    return float(err)


def test_green_recovery_3d_sphere_converges(reference_grid_dir):
    mesh0 = read_mesh(
        f"{reference_grid_dir}/sphere_0.inp", dim=3, force_material=0
    )
    manifold = SphericalManifold()
    mesh1 = refine_uniform(mesh0, manifold, times=2)
    mesh2 = refine_uniform(mesh0, manifold, times=3)
    src = (0.3, 0.3, 0.3)
    e1 = green_recovery_error(mesh1, 3, src)
    e2 = green_recovery_error(mesh2, 3, src)
    assert e1 < 0.2, e1
    assert e2 < 0.6 * e1, (e1, e2)  # first-order-ish convergence


def test_green_recovery_2d_circle(reference_grid_dir):
    mesh0 = read_mesh(
        f"{reference_grid_dir}/circle_0.inp", dim=2, force_material=0
    )
    mesh1 = refine_uniform(mesh0, SphericalManifold((0.0, 0.0)))
    src = (0.1, 0.2)
    e0 = green_recovery_error(mesh0, 2, src, quad_order=8, sing_order=10)
    e1 = green_recovery_error(mesh1, 2, src, quad_order=8, sing_order=10)
    assert e0 < 0.15, e0  # 10-cell circle
    assert e1 < 0.5 * e0, (e0, e1)  # refined circle converges
