"""On-chip timing of the adaptive two-level quadrature path: is the
near-pair correction pass (top_k selection + gathered delta + scatter) cheap
enough to make (low-order bulk + corrections) beat the single-pass
full-order assembly?

    python scripts/tune_adaptive.py
"""

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
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K


def main():
    refine = int(os.environ.get("BENCH_REFINE", "3"))
    mesh = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    mesh = refine_uniform(mesh, SphericalManifold(), times=refine)
    space = build_scalar_space(mesh, 1)
    n, Nc = space.n_nodes, mesh.n_cells
    dtype = jnp.float32
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), dtype)
    sp0 = support_points(euler, space, space)
    print(f"{n} nodes, {Nc} panels on {jax.devices()[0]}", flush=True)
    pairs = float(n) * float(Nc)

    # raw selection cost: top_k vs approx_min_k on the [n, Nc] distances
    d2 = jnp.sum(
        (sp0[:, None, :] - euler[space.cells_nodes].mean(1)[None, :, :]) ** 2,
        axis=-1,
    )

    def t_of(f, *a):
        out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / 5

    tk = jax.jit(lambda x: jax.lax.top_k(-x, 64))
    ak = jax.jit(lambda x: jax.lax.approx_min_k(x, 64, recall_target=0.95))
    print(f"top_k[{n}x{Nc}]: {t_of(tk, d2)*1e3:.1f} ms", flush=True)
    print(f"approx_min_k:   {t_of(ak, d2)*1e3:.1f} ms", flush=True)

    def timed_assembly(**kw):
        cfg = AssemblyConfig(
            quad_order=4,
            row_tile=min(256, n),
            dtype=dtype,
            **kw,
        )
        tables = build_assembly_tables(space, space, cfg)
        sp = support_points(euler, space, space)

        @jax.jit
        def run(e, s, k):
            def body(i, carry):
                V, K = carry
                e_i = e + jnp.asarray(1e-30, dtype) * V[0, 0]
                return assemble_V_K(e_i, s, tables)

            return jax.lax.fori_loop(0, k, body, assemble_V_K(e, s, tables))

        def t(k):
            out = run(euler, sp, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            out = run(euler, sp, k)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            return time.perf_counter() - t0

        t(0)
        return max((t(4) - t(1)) / 3, 1e-9)

    for backend, cc in (("jax", 512), ("pallas", 64)):
        base = timed_assembly(backend=backend, cell_chunk=min(cc, Nc),
                              column_mode="node" if backend == "pallas" else "gather")
        print(
            f"{backend} single-pass q4: {base*1e3:.1f} ms "
            f"{pairs/base:.3e} pairs/s",
            flush=True,
        )
        for sel in ("exact", "approx"):
            try:
                dt_s = timed_assembly(
                    backend=backend,
                    cell_chunk=min(cc, Nc),
                    column_mode="node" if backend == "pallas" else "gather",
                    quad_order_far=2,
                    near_panels=64,
                    near_selector=sel,
                )
                print(
                    f"{backend} adaptive far-q2 near-q4 sel={sel}: "
                    f"{dt_s*1e3:.1f} ms {pairs/dt_s:.3e} pairs/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{backend} adaptive sel={sel}: failed {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
