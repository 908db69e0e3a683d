"""Periodic (repeated-image) kernel and cylindrical wall factory tests
(reference `include/repeated_kernel.h`, `create_cylindrical_wall`
`source/bem_stokes.cc:887-1156`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.kernels.stokeslet import stokeslet_G, stresslet_W
from bemstokes_tpu.kernels.repeated import repeated_G, repeated_W, repeated_G_Wn
from bemstokes_tpu.mesh.factories import create_cylindrical_wall
from bemstokes_tpu.mesh import build_scalar_space
from bemstokes_tpu.fem.geometry import panel_geometry
from bemstokes_tpu.fem.quadrature import gauss_quad
from bemstokes_tpu.fem.reference_element import reference_element


def _manual_periodic_G(p, h, n_images):
    acc = np.zeros((3, 3))
    for k in range(-n_images, n_images + 1):
        q = np.array(p, dtype=float)
        q[1] += k * h
        acc += np.asarray(stokeslet_G(jnp.asarray(q)))
    return acc


def test_repeated_G_matches_explicit_sum():
    p = jnp.asarray([0.3, 0.4, -0.2])
    h, ni = 2.0, 10
    G = np.asarray(repeated_G(p, h, axis=1, n_images=ni))
    assert np.allclose(G, _manual_periodic_G([0.3, 0.4, -0.2], h, ni), atol=1e-14)
    # symmetry of the Oseen tensor survives the image sum
    assert np.allclose(G, G.T, atol=1e-14)


def test_repeated_kernels_shift_invariance():
    """Shifting the evaluation point by one lattice period only changes the
    result by the two boundary images (finite sum) — with many images the
    difference is tiny, which is the point of the truncated lattice."""
    p = jnp.asarray([0.3, 0.4, -0.2])
    h, ni = 2.0, 10
    G0 = np.asarray(repeated_G(p, h, n_images=ni))
    G1 = np.asarray(repeated_G(p + jnp.asarray([0.0, h, 0.0]), h, n_images=ni))
    # boundary-image truncation error ~ 1/(4*pi*(n*h))
    assert np.abs(G0 - G1).max() < 2.0 / (4 * np.pi * ni * h)


def test_repeated_G_Wn_consistency():
    p = jnp.asarray([[0.5, -0.3, 0.7], [1.2, 0.1, -0.4]])
    n = jnp.asarray([[0.0, 1.0, 0.0], [0.6, 0.0, 0.8]])
    G, Wn = repeated_G_Wn(p, n, h=1.5, n_images=4)
    G_ref = repeated_G(p, 1.5, n_images=4)
    W_ref = repeated_W(p, 1.5, n_images=4)
    Wn_ref = jnp.einsum("xijk,xk->xij", W_ref, n)
    assert np.allclose(np.asarray(G), np.asarray(G_ref), atol=1e-13)
    assert np.allclose(np.asarray(Wn), np.asarray(Wn_ref), atol=1e-13)


def test_cylindrical_wall_geometry():
    r, H = 2.0, 4.0
    mesh = create_cylindrical_wall(
        radius=r, height=H, direction=(0, 0, 1), point_on_axis=(1.0, 0.0, 0.0),
        wall_type="no_slip", n_around=12, n_length=6,
    )
    # all vertices on the cylinder
    d = np.linalg.norm(mesh.vertices[:, :2] - np.array([1.0, 0.0]), axis=1)
    assert np.allclose(d, r, atol=1e-12)
    assert mesh.vertices[:, 2].min() == pytest.approx(-H / 2)
    assert mesh.vertices[:, 2].max() == pytest.approx(H / 2)
    assert (mesh.material_id == 2).all()

    # normals point toward the axis (fluid inside the container)
    space = build_scalar_space(mesh, 1)
    el = reference_element(2, 1)
    pts, wts = gauss_quad(2)
    xq, normals, jxw = panel_geometry(
        jnp.asarray(mesh.vertices)[jnp.asarray(space.cells_nodes)],
        jnp.asarray(el.shape_values(pts)),
        jnp.asarray(el.shape_grads(pts)),
        jnp.asarray(wts),
        jnp.asarray(np.where(mesh.flip_normal, -1.0, 1.0)),
        ambient_dim=3,
    )
    to_axis = jnp.asarray([1.0, 0.0, 0.0]) - xq
    to_axis = to_axis.at[..., 2].set(0.0)
    assert (np.asarray(jnp.sum(normals * to_axis, axis=-1)) > 0).all()

    # area converges to 2*pi*r*H under cylindrical refinement
    mesh2 = create_cylindrical_wall(
        radius=r, height=H, direction=(0, 0, 1), point_on_axis=(1.0, 0.0, 0.0),
        n_around=12, n_length=6, refinements=2,
    )
    space2 = build_scalar_space(mesh2, 1)
    xq2, _, jxw2 = panel_geometry(
        jnp.asarray(mesh2.vertices)[jnp.asarray(space2.cells_nodes)],
        jnp.asarray(el.shape_values(pts)),
        jnp.asarray(el.shape_grads(pts)),
        jnp.asarray(wts),
        jnp.asarray(np.where(mesh2.flip_normal, -1.0, 1.0)),
        ambient_dim=3,
    )
    area = float(jnp.sum(jxw2))
    assert area == pytest.approx(2 * np.pi * r * H, rel=2e-3)

    # flip_normal reverses orientation
    mesh3 = create_cylindrical_wall(radius=r, height=H, flip_normal=True)
    assert mesh3.flip_normal.all()
