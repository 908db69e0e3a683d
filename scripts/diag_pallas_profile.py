"""Subtraction profile of the fused Pallas assembly kernel (VERDICT r4 ask
#2: pin the 46%-of-instruction-bound limiter with a measurement, not an
inference).  No instruction-level profiler reaches the chip through the
axon relay, so the attribution is measured directly: the kernel is rerun
with op GROUPS removed (`parts=` variants of `_node_kernel_t`) and the
marginal cost of each group is the time difference.

Groups and their per-interaction op counts (same accounting as the 59-op
model in BENCH_DETAILS):
  sweep_only : 17 ops — table loads, R, r2, zero-masking, rsqrt, wiR, one
               accumulator plane + its reduction (the irreducible floor)
  v_only     : 38 ops — + invR2, wgs, 6 dyadic+FMA V planes
  k_only     : 43 ops — + invR2, pn, wws, 6 dyadic+FMA K planes (no vd)
  both       : 59 ops — the production kernel

If the MARGINAL rate of the added op groups sits near the chip's measured
VPU FMA issue rate while `sweep_only` is far from its own op model, the
limiter is the fixed per-valence-step machinery (broadcast materialization,
loop overhead); if the marginal rate itself is ~45% of peak, Mosaic issues
EVERY vector op at that efficiency and the 59-op model's gap is uniform
per-op overhead.

    python scripts/diag_pallas_profile.py        # on the TPU

Writes PALLAS_PROFILE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points, panel_geometry
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables
from bemstokes_tpu.ops.assemble import node_column_samples, node_sweep_soa
from bemstokes_tpu.ops.pallas_node import pallas_node_blocks

OPS = {"sweep_only": 17, "v_only": 38, "k_only": 43, "both": 59}


def main():
    refine = int(os.environ.get("BENCH_REFINE", "3"))
    mesh = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    mesh = refine_uniform(mesh, SphericalManifold(), times=refine)
    space = build_scalar_space(mesh, 1)
    n = space.n_nodes
    dtype = jnp.float32
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), dtype)
    sp = support_points(euler, space, space)
    cfg = AssemblyConfig(dtype=dtype, backend="pallas", column_mode="node")
    tables = build_assembly_tables(space, space, cfg)
    vmax, nq = tables.inc_slot.shape[1], len(tables.q_weights)
    T, CJ = cfg.pallas_row_tile, cfg.pallas_col_chunk
    print(f"{n} nodes on {jax.devices()[0]}; vmax={vmax} nq={nq}", flush=True)

    xq, normals, jxw = panel_geometry(
        euler[jnp.asarray(tables.cells_nodes_map)],
        jnp.asarray(tables.phi_map, dtype),
        jnp.asarray(tables.dphi_map, dtype),
        jnp.asarray(tables.q_weights, dtype),
        jnp.asarray(tables.flip_sign, dtype),
        ambient_dim=3,
    )
    Yj, Nj, Wj, vmax, nq = node_column_samples(tables, xq, normals, jxw)
    xi_p, Y, N, W = node_sweep_soa(
        sp, Yj, Nj, Wj, d=3, nq=nq, vmax=vmax, T=T, CJ=CJ, bulk_dt=dtype
    )
    interactions = float(xi_p.shape[0]) * float(Y.shape[0] * CJ) * vmax * nq

    def timed(parts):
        @jax.jit
        def run(xi, k):
            def body(i, carry):
                V, K = carry
                xi_i = xi + jnp.asarray(1e-30, dtype) * V[0, 0, 0]
                return pallas_node_blocks(
                    xi_i, Y, N, W, CJ=CJ, nq=nq, vmax=vmax, T=T,
                    transposed=True, parts=parts,
                )
            return jax.lax.fori_loop(
                0, k, body,
                pallas_node_blocks(
                    xi, Y, N, W, CJ=CJ, nq=nq, vmax=vmax, T=T,
                    transposed=True, parts=parts,
                ),
            )

        def t(k):
            out = run(xi_p, k)
            np.asarray(out[0].ravel()[0])
            t0 = time.perf_counter()
            out = run(xi_p, k)
            np.asarray(out[0].ravel()[0])
            return time.perf_counter() - t0

        t(0)
        return max((t(4) - t(1)) / 3, 1e-9)

    rows = {}
    for parts in ("sweep_only", "v_only", "k_only", "both"):
        dt_s = timed(parts)
        rate = interactions / dt_s
        op_rate = rate * OPS[parts]
        rows[parts] = dict(
            time_s=dt_s,
            model_ops=OPS[parts],
            interactions_per_s=rate,
            implied_ops_per_s=op_rate,
        )
        print(
            f"{parts:11s}: {dt_s*1e3:7.1f} ms  {rate:.3e} inter/s  "
            f"{op_rate/1e12:.2f} Tops/s implied",
            flush=True,
        )

    # marginal attribution: what does ADDING each op group cost?
    def marginal(a, b, dops):
        dt_s = rows[a]["time_s"] - rows[b]["time_s"]
        return dict(
            extra_ops=dops,
            extra_time_s=dt_s,
            marginal_ops_per_s=(dops * interactions / dt_s)
            if dt_s > 0
            else None,
        )

    prof = dict(
        nodes=n,
        interactions=interactions,
        tile=dict(T=T, CJ=CJ, vmax=vmax, nq=nq),
        rows=rows,
        marginal_K_group=marginal("both", "v_only", OPS["both"] - OPS["v_only"]),
        marginal_V_group=marginal("both", "k_only", OPS["both"] - OPS["k_only"]),
        floor_share_of_both=rows["sweep_only"]["time_s"]
        / rows["both"]["time_s"],
    )
    with open("PALLAS_PROFILE.json", "w") as f:
        json.dump(prof, f, indent=2)
    print(json.dumps(prof["marginal_K_group"], indent=2))
    print(
        f"floor (sweep_only) = {prof['floor_share_of_both']*100:.0f}% of the "
        f"full kernel's time",
        flush=True,
    )


if __name__ == "__main__":
    main()
