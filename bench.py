"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: collocation assembly throughput in panel-pairs/s
(collocation-node x panel pairs, the O(N^2) work unit of the BEM operator
build — BASELINE.md).  The reference publishes no numbers, so vs_baseline is
measured against this repo's own speed-of-light-derived target
(ASSEMBLY_TARGET_PAIRS_PER_S below; see BASELINE.md).

Also measured (reported on stderr and in BENCH_DETAILS.json): dense GMRES
matvec GFLOP/s per chip, end-to-end frame solve latency, and the sphere-drag
accuracy gate.

Run on the real TPU chip: `python bench.py`.  `--cpu` forces the host
platform (for smoke-testing the harness).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Per-pair work at quad order 4 (16 points): ~6 kflop of f32 VPU-dominated
# kernel evaluation + MXU contraction.  At ~1 TFLOP/s sustained f32
# elementwise throughput on one v5e core this puts speed-of-light around
# 1.5e8 pairs/s; the target keeps a 1.5x engineering margin.
ASSEMBLY_TARGET_PAIRS_PER_S = 1.0e8


def main():
    force_cpu = "--cpu" in sys.argv
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bemstokes_tpu.config import ProblemConfig, QuadratureConfig
    from bemstokes_tpu.mesh import read_mesh, build_scalar_space
    from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
    from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
    from bemstokes_tpu.ops import (
        AssemblyConfig,
        build_assembly_tables,
        assemble_V_K,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"benchmarking on {dev}", file=sys.stderr)

    # ---- build a bench-scale sphere: refine the reference mesh ----
    refine_levels = int(os.environ.get("BENCH_REFINE", "2" if not on_tpu else "3"))
    mesh = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    mesh = refine_uniform(mesh, SphericalManifold(), times=refine_levels)
    space = build_scalar_space(mesh, 1)
    n, Nc = space.n_nodes, mesh.n_cells
    print(f"bench mesh: {n} nodes, {Nc} panels", file=sys.stderr)

    dtype = jnp.float32 if on_tpu else jnp.float64
    acfg = AssemblyConfig(
        quad_order=4,
        row_tile=min(256, n),
        cell_chunk=min(512, Nc),
        dtype=dtype,
    )
    tables = build_assembly_tables(space, space, acfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), dtype)
    sp = support_points(euler, space, space)

    # ---- assembly throughput ----
    # The axon relay's block_until_ready does NOT synchronize and each
    # dispatch carries ~25 ms RPC overhead, so: (a) loop the repetitions
    # inside ONE jitted dispatch with a data dependency chaining iterations,
    # (b) force sync with a scalar host readback, (c) difference two loop
    # lengths to cancel the fixed dispatch+readback overhead.
    def asm_loop(k):
        @jax.jit
        def run(e, s):
            def body(i, carry):
                V, K = carry
                # 1e-30 perturbation: arithmetic no-op, un-foldable dependency
                e_i = e + jnp.asarray(1e-30, dtype) * V[0, 0]
                return assemble_V_K(e_i, s, tables)
            V0, K0 = assemble_V_K(e, s, tables)
            return jax.lax.fori_loop(0, k, body, (V0, K0))
        return run

    def timed(run, *args):
        out = run(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])  # warm compile + sync
        t0 = time.perf_counter()
        out = run(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        return time.perf_counter() - t0, out

    t0 = time.perf_counter()
    k_lo, k_hi = 1, 4
    t_lo, (V, K) = timed(asm_loop(k_lo), euler, sp)
    t_hi, (V, K) = timed(asm_loop(k_hi), euler, sp)
    t_asm = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    compile_and_first = time.perf_counter() - t0
    pairs = float(n) * float(Nc)
    pairs_per_s = pairs / t_asm
    nq = tables.q_weights.shape[0]
    print(
        f"assembly: {t_asm*1e3:.1f} ms (first+compile {compile_and_first:.1f}s), "
        f"{pairs_per_s:.3e} panel-pairs/s ({pairs_per_s*nq:.3e} pair-qpoints/s)",
        file=sys.stderr,
    )

    # ---- matvec GFLOP/s (same in-dispatch loop technique) ----
    x = jnp.ones((3 * n,), dtype)

    def mv_loop(k):
        @jax.jit
        def run(M, v):
            def body(i, v):
                return M @ (v / jnp.linalg.norm(v))
            return jax.lax.fori_loop(0, k, body, v)
        return run

    t_lo, _ = timed(mv_loop(5), V, x)
    t_hi, _ = timed(mv_loop(55), V, x)
    t_mv = max((t_hi - t_lo) / 50, 1e-9)
    gflops = 2.0 * (3.0 * n) ** 2 / t_mv / 1e9
    print(f"matvec: {t_mv*1e3:.2f} ms -> {gflops:.1f} GFLOP/s", file=sys.stderr)

    # ---- accuracy gate: sphere drag vs Stokes law on the refined mesh ----
    details = dict(
        nodes=n,
        panels=Nc,
        assembly_s=t_asm,
        panel_pairs_per_s=pairs_per_s,
        matvec_s=t_mv,
        matvec_gflops=gflops,
        dtype=str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        device=str(dev),
        refine_levels=refine_levels,
    )
    if os.environ.get("BENCH_ACCURACY", "1") == "1":
        try:
            # the accuracy gate needs f64: run it on the host CPU backend
            cpu0 = jax.devices("cpu")[0] if not force_cpu else dev
            from bemstokes_tpu.problem import StokesBEMProblem
            from bemstokes_tpu.config import SolverConfig
            from bemstokes_tpu.physics.rigid import flatten

            acc_mesh = refine_uniform(
                read_mesh(
                    "/root/reference/tests/grid_test/sphere_translation_0.msh",
                    dim=3,
                ),
                SphericalManifold(),
                times=1,
            )
            cfg = ProblemConfig(
                grid_type="ImposedVelocity",
                imposed_component=0,
                force_pole="Origin",
                map_degree=4,
                body_manifold="sphere",
                quadrature=QuadratureConfig(order=6, singular_order=9),
                solver=SolverConfig(solve_directly=True),
                dtype="float64",
            )
            prob = StokesBEMProblem(acc_mesh, cfg)
            with jax.default_device(cpu0):
                res = prob.solve_frame(
                    prob.initial_euler(), jnp.zeros((3 * prob.n,), jnp.float64)
                )
            N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
            F = np.asarray(N_dual_flat @ res["stokes_forces"])
            drag_rel_err = abs(abs(F[0]) - 6 * np.pi) / (6 * np.pi)
            details["sphere_drag_rel_err"] = float(drag_rel_err)
            print(f"sphere drag rel err: {drag_rel_err:.2e}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            details["sphere_drag_rel_err"] = None
            print(f"accuracy gate failed to run: {e}", file=sys.stderr)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "assembly_panel_pairs_per_s",
                "value": pairs_per_s,
                "unit": "pairs/s",
                "vs_baseline": pairs_per_s / ASSEMBLY_TARGET_PAIRS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
