"""The hand-fused Pallas assembly kernel must agree with the XLA-fused JAX
path bit-for-bit in semantics (same masking/padding rules) — run here in
Pallas interpreter mode on CPU against the default path."""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
import dataclasses


def test_pallas_matches_jax(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig(quad_order=3, row_tile=32, cell_chunk=16)
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)
    V0, K0 = assemble_V_K(euler, sp, tables)

    pcfg = dataclasses.replace(cfg, backend="pallas_interpret")
    ptables = dataclasses.replace(tables, cfg=pcfg)
    V1, K1 = assemble_V_K(euler, sp, ptables)

    assert np.allclose(np.asarray(V0), np.asarray(V1), atol=1e-13)
    assert np.allclose(np.asarray(K0), np.asarray(K1), atol=1e-13)

    # node-mode Pallas backend (column-centric pairwise kernel + singular
    # delta correction) against the same oracle
    ncfg = dataclasses.replace(
        cfg, backend="pallas_interpret", column_mode="node"
    )
    ntables = dataclasses.replace(tables, cfg=ncfg)
    V2, K2 = assemble_V_K(euler, sp, ntables)
    assert np.allclose(np.asarray(V0), np.asarray(V2), atol=1e-11)
    assert np.allclose(np.asarray(K0), np.asarray(K2), atol=1e-11)


def test_pallas_image_kernels_match_jax(reference_grid_dir):
    """The fused image-kernel variants (free-surface mirror, Blake no-slip
    wall) of the node-mode Pallas kernel against the XLA oracle, interpret
    mode.  The sphere sits above a wall plane at y = -2 (wall_axis 1)."""
    from bemstokes_tpu.ops.assemble import KERNEL_FREE_SURFACE, KERNEL_NO_SLIP

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    space = build_scalar_space(mesh, 1)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))

    for kernel in (KERNEL_FREE_SURFACE, KERNEL_NO_SLIP):
        cfg = AssemblyConfig(
            kernel=kernel,
            wall_axis=1,
            wall_position=-2.0,
            quad_order=3,
            row_tile=32,
            cell_chunk=16,
        )
        tables = build_assembly_tables(space, space, cfg)
        sp = support_points(euler, space, space)
        V0, K0 = assemble_V_K(euler, sp, tables)

        ncfg = dataclasses.replace(
            cfg, backend="pallas_interpret", column_mode="node"
        )
        ntables = dataclasses.replace(tables, cfg=ncfg)
        V1, K1 = assemble_V_K(euler, sp, ntables)
        assert np.allclose(np.asarray(V0), np.asarray(V1), atol=1e-11), kernel
        assert np.allclose(np.asarray(K0), np.asarray(K1), atol=1e-11), kernel


def test_mixed_bulk_f32_pallas_under_f64(reference_grid_dir):
    """mixed_bulk: f64 assembly with the smooth bulk swept in f32 through
    the Pallas kernel (interpret mode) — entries agree with the pure-f64
    path to f32 rounding, and the singular/near corrections stay f64."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    space = build_scalar_space(mesh, 1)
    cfg = AssemblyConfig(
        quad_order=3, row_tile=32, cell_chunk=16, dtype=jnp.float64
    )
    tables = build_assembly_tables(space, space, cfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space))
    sp = support_points(euler, space, space)
    V0, K0 = assemble_V_K(euler, sp, tables)

    mcfg = dataclasses.replace(
        cfg, backend="pallas_interpret", column_mode="node", mixed_bulk=True
    )
    mtables = dataclasses.replace(tables, cfg=mcfg)
    V1, K1 = assemble_V_K(euler, sp, mtables)
    assert V1.dtype == jnp.float64
    scale = float(np.max(np.abs(np.asarray(V0))))
    assert np.max(np.abs(np.asarray(V0 - V1))) < 5e-6 * scale
    # K's stresslet contractions cancel internally, so per-entry f32 noise
    # can reach ~5e-5 of the matrix scale (measured 4.9e-5 here)
    kscale = float(np.max(np.abs(np.asarray(K0)))) or 1.0
    assert np.max(np.abs(np.asarray(K0 - K1))) < 2e-4 * kscale
    # but NOT bitwise equal: the bulk really ran in f32
    assert np.max(np.abs(np.asarray(V0 - V1))) > 0
