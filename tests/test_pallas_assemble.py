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
