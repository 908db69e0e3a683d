"""Flagellum geometry tests: tube factory, spiral deformation, phase
rotation (reference FlagellarGeometryHandler + `tests/motility_flagellum`
geometry stage)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.flagella import (
    FlagellumConfig,
    create_initial_flagellum_mesh,
    reference_spiral_euler,
    reference_constant_spiral_euler,
    euler_at_theta,
)
from bemstokes_tpu.mesh import build_scalar_space
from bemstokes_tpu.fem.geometry import euler_from_mesh


def test_tube_mesh_geometry():
    cfg = FlagellumConfig()
    mesh = create_initial_flagellum_mesh(cfg, n_length=16, n_around=8)
    assert mesh.n_cells == 16 * 8
    r = np.sqrt(mesh.vertices[:, 1] ** 2 + mesh.vertices[:, 2] ** 2)
    assert np.allclose(r, cfg.a, atol=1e-12)
    assert mesh.vertices[:, 0].min() == pytest.approx(cfg.delta_head_flagellum)
    assert mesh.vertices[:, 0].max() == pytest.approx(
        cfg.delta_head_flagellum + cfg.Lx
    )


def test_spiral_deformation_properties():
    cfg = FlagellumConfig()
    mesh = create_initial_flagellum_mesh(cfg)
    space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    mask = jnp.ones((space.n_nodes,))
    spiral = np.asarray(reference_spiral_euler(euler, cfg, mask))
    # amplitude grows toward alpha along the tube
    r_spiral = np.sqrt(spiral[:, 1] ** 2 + spiral[:, 2] ** 2)
    x = np.asarray(euler[:, 0]) - cfg.delta_head_flagellum
    far = x > 0.8 * cfg.Lx
    near = (x > 0) & (x < 0.5)
    assert r_spiral[far].mean() > 3 * r_spiral[near].mean()
    assert r_spiral[far].mean() == pytest.approx(cfg.alpha, rel=0.25)
    # the head-side end (x <= 0) stays put
    fixed = x <= 0
    if fixed.any():
        assert np.allclose(spiral[fixed], np.asarray(euler)[fixed])


def test_constant_spiral_and_phase_rotation():
    cfg = FlagellumConfig()
    mesh = create_initial_flagellum_mesh(cfg)
    space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    mask = jnp.ones((space.n_nodes,))
    ref = reference_constant_spiral_euler(euler, cfg, mask)
    # phase rotation preserves x and the radius about the x axis
    rot = euler_at_theta(ref, 0.7, mask)
    assert np.allclose(np.asarray(rot)[:, 0], np.asarray(ref)[:, 0], atol=1e-12)
    r0 = np.linalg.norm(np.asarray(ref)[:, 1:], axis=1)
    r1 = np.linalg.norm(np.asarray(rot)[:, 1:], axis=1)
    assert np.allclose(r0, r1, atol=1e-12)
    # full revolution returns the geometry
    rot_full = euler_at_theta(ref, 2 * np.pi, mask)
    assert np.allclose(np.asarray(rot_full), np.asarray(ref), atol=1e-12)
