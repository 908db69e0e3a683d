"""Multi-device (8 virtual CPU devices) row-sharded assembly and matvec vs
the single-chip reference path — the multi-process coverage the reference
lacks (SURVEY.md section 4 implication)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
from bemstokes_tpu.parallel import (
    row_mesh,
    sharded_assemble,
    sharded_matvec,
    flat_to_slab,
    slab_to_flat,
    padded_rows,
)


@pytest.fixture(scope="module")
def setup(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig()
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)
    return tables, euler, sp


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_assembly_matches_single_chip(setup):
    tables, euler, sp = setup
    n, d = tables.n_nodes, 3
    dmesh = row_mesh()
    Vs, Ks = sharded_assemble(euler, sp, tables, dmesh)
    V, K = assemble_V_K(euler, sp, tables)

    n_pad, nloc = padded_rows(n, dmesh)
    ndev = dmesh.devices.size
    # slab -> global rows: device k, component a, local node i -> a*n + k*nloc + i
    Vs = np.asarray(Vs).reshape(ndev, d, nloc, d * n)
    Vg = np.concatenate([Vs[k] for k in range(ndev)], axis=1).reshape(
        d, n_pad, d * n
    )[:, :n].reshape(d * n, d * n)
    assert np.allclose(Vg, np.asarray(V), atol=1e-13), np.abs(
        Vg - np.asarray(V)
    ).max()
    Ks = np.asarray(Ks).reshape(ndev, d, nloc, d * n)
    Kg = np.concatenate([Ks[k] for k in range(ndev)], axis=1).reshape(
        d, n_pad, d * n
    )[:, :n].reshape(d * n, d * n)
    assert np.allclose(Kg, np.asarray(K), atol=1e-13)


def test_sharded_matvec_roundtrip(setup):
    tables, euler, sp = setup
    n, d = tables.n_nodes, 3
    dmesh = row_mesh()
    Vs, _ = sharded_assemble(euler, sp, tables, dmesh)
    V, _ = assemble_V_K(euler, sp, tables)
    x = jnp.asarray(np.random.RandomState(0).randn(d * n))
    y_slab = sharded_matvec(Vs, x, dmesh)
    y = slab_to_flat(y_slab, n, d, dmesh)
    assert np.allclose(np.asarray(y), np.asarray(V @ x), atol=1e-12)


def test_slab_layout_roundtrip(setup):
    tables, _, _ = setup
    n, d = tables.n_nodes, 3
    dmesh = row_mesh()
    v = jnp.asarray(np.random.RandomState(1).randn(d * n))
    v2 = slab_to_flat(flat_to_slab(v, n, d, dmesh), n, d, dmesh)
    assert np.allclose(np.asarray(v), np.asarray(v2))
