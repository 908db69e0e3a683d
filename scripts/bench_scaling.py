"""Scaling benchmark over a 1/2/4/8-device row mesh.

TWO regimes, reported separately:

- On REAL chips (`--tpu`, multi-chip slice under
  `bemstokes_tpu.parallel.initialize_multihost()`): classic weak/strong
  scaling.  Weak scaling for a dense N^2 BEM operator means constant PAIRS
  PER DEVICE (mesh refined so n ~ n0 * sqrt(ndev)); efficiency =
  throughput / (ndev * throughput at 1 device), BASELINE target >= 80%.

- On the VIRTUAL CPU mesh (default; 8 devices forced onto the host's
  cores): the devices SHARE the same silicon, so per-device throughput
  cannot scale and classic efficiency is meaningless.  What the virtual
  mesh CAN validate is the cost of the distribution machinery itself:
  `overhead_efficiency` = t(1 device, whole problem) / t(ndev devices,
  same problem).  1.0 means sharding + collectives add zero overhead over
  the single-device run — the upper bound on what real hardware would see
  added on top of ideal compute scaling.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# default to the virtual CPU mesh; pass --tpu to run on real chips (e.g.
# under initialize_multihost on a pod slice)
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bemstokes_tpu.parallel import (
    initialize_multihost,
    row_mesh,
    sharded_assemble,
    sharded_matvec,
)
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables


def _mesh_for(refine):
    m = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    return refine_uniform(m, SphericalManifold(), times=refine)


def _sync(out):
    """Force completion with a scalar host readback: on the axon TPU relay
    `block_until_ready` does NOT synchronize (bench.py documents the same),
    and the execution queue is ordered so one element read drains it."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def measure(ndev, refine, dtype):
    mesh = _mesh_for(refine)
    space = build_scalar_space(mesh, 1)
    n, Nc = space.n_nodes, mesh.n_cells
    dmesh = row_mesh(devices=jax.devices()[:ndev])
    acfg = AssemblyConfig(
        quad_order=4,
        quad_order_far=2,
        near_panels=32,
        row_tile=64,
        cell_chunk=min(256, Nc),
        dtype=dtype,
    )
    tables = build_assembly_tables(space, space, acfg)
    euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), dtype)
    sp = support_points(euler, space, space)

    asm = jax.jit(lambda e, s: sharded_assemble(e, s, tables, dmesh))
    t_asm = _timed(asm, euler, sp, reps=1)
    V, _ = asm(euler, sp)
    x = jnp.ones((3 * n,), dtype)
    mv = jax.jit(lambda A, v: sharded_matvec(A, v, dmesh))
    t_mv = _timed(mv, V, x, reps=10)
    # overlap comparison (BASELINE north star): explicit ppermute-ring
    # formulation vs the all-gather matvec on the same operands
    from bemstokes_tpu.parallel.sharded import (
        flat_to_slab,
        sharded_matvec_ring,
    )
    from bemstokes_tpu.parallel.lu import (
        slab_reorder_columns,
        slab_lu_factor,
        slab_lu_solve,
    )

    A2 = slab_reorder_columns(V, n, 3, dmesh)
    x_slab = flat_to_slab(x, n, 3, dmesh)
    mv_ring = jax.jit(lambda A, v: sharded_matvec_ring(A, v, dmesh))
    t_ring = _timed(mv_ring, A2, x_slab, reps=10)

    # ---- distributed stale-LU cost model (VERDICT r3 ask #4): factor once
    # per refactorization, apply per GMRES iteration; the lu.py docstring
    # claims apply ~ 2 slab GEMVs — measure both against the matvec ----
    lu_fac = jax.jit(lambda A: slab_lu_factor(A, dmesh))
    t_factor = _timed(lu_fac, A2, reps=1)
    lu, perm = lu_fac(A2)
    lu_sol = jax.jit(lambda l, p, b: slab_lu_solve(l, p, b, dmesh))
    t_solve = _timed(lu_sol, lu, perm, x_slab, reps=10)
    pairs = float(n) * float(Nc)
    return dict(
        ndev=ndev,
        nodes=n,
        panels=Nc,
        pairs_per_s=pairs / t_asm,
        matvec_gflops=2.0 * (3.0 * n) * (V.shape[0]) / t_mv / 1e9,
        matvec_ring_gflops=2.0 * (3.0 * n) * (V.shape[0]) / t_ring / 1e9,
        matvec_s=t_mv,
        matvec_ring_s=t_ring,
        lu_factor_s=t_factor,
        lu_solve_s=t_solve,
        lu_solve_vs_2_matvecs=t_solve / (2.0 * t_mv),
    )


def stale_lu_vs_block_jacobi(refines=(0, 1)):
    """GMRES iteration counts as N grows: fresh distributed LU, STALE LU on
    the next frame's geometry (the reference DirectPreconditioner operating
    point), and block-Jacobi — where the once-per-refactorization O(N^3/P)
    factor pays for itself (VERDICT r3 ask #4)."""
    import jax.numpy as jnp

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.parallel.solve import make_sharded_frame_step
    from bemstokes_tpu.fem.geometry import euler_from_mesh

    out = []
    for refine in refines:
        mesh0 = _mesh_for(refine)
        mesh1 = read_mesh(
            "/root/reference/tests/grid_test/sphere_translation_1.msh", dim=3
        )
        mesh1 = refine_uniform(mesh1, SphericalManifold(), times=refine)
        # "ILU" maps to the distributed block-Jacobi-LU (each device's
        # diagonal block); "Direct" is the full distributed stale-LU.
        # TPU has no f64 LuDecomposition: use the mixed-precision path
        # there (f32 assembly + f32 factors), like the production configs
        on_tpu = jax.devices()[0].platform != "cpu"
        for ptype in ("Direct", "ILU"):
            cfg = ProblemConfig(
                grid_type="Real",
                force_pole="Origin",
                dtype="float32" if on_tpu else "float64",
                solver=SolverConfig(
                    preconditioner_type=ptype,
                    max_steps=3000,
                    preconditioner_dtype="float32" if on_tpu else "same",
                    tolerance=1e-5 if on_tpu else 1e-7,
                ),
            )
            prob = StokesBEMProblem(mesh0, cfg)
            step = make_sharded_frame_step(prob, row_mesh())
            euler0 = prob.initial_euler()
            euler1 = jnp.asarray(
                euler_from_mesh(mesh1.vertices, prob.map_space)
            )
            sdot = prob.shape_velocities_fd(euler0, euler1)
            _, _, i0 = step(euler0, sdot)  # Direct: fresh factorization
            _, _, i1 = step(euler1, sdot)  # Direct: STALE factors
            out.append(
                dict(
                    refine=refine,
                    n=prob.n,
                    precond=ptype,
                    iters_fresh=int(i0["iterations"]),
                    iters_stale_next_frame=int(i1["iterations"]),
                    # full config labels: the CPU (ndev=8, f64, tol 1e-7)
                    # and TPU (ndev=1, f32, tol 1e-5) tables are different
                    # experiments and must be readable as such
                    ndev=len(jax.devices()),
                    dtype=str(cfg.dtype),
                    backend=jax.devices()[0].platform,
                    tolerance=cfg.solver.tolerance,
                    max_steps=cfg.solver.max_steps,
                )
            )
            if len(jax.devices()) < 2:
                # at ndev=1 the block-Jacobi "diagonal block" IS the whole
                # matrix, so ILU degenerates to a full LU — the comparison
                # is only meaningful on a multi-device mesh (the virtual
                # 8-device CPU run is the canonical table)
                out[-1]["note"] = "ndev=1: block-Jacobi == full LU"
            print(
                f"iters n={prob.n} {ptype}: fresh {out[-1]['iters_fresh']}"
                f", next-frame {out[-1]['iters_stale_next_frame']}"
            )
    return out


STALE_LU_VS_BLOCK_JACOBI_NOTE = (
    "Reconciliation of the CPU-vs-TPU ILU discrepancy (CPU file: ILU at "
    "46 / 3000 iterations; TPU file: 3 / 3 on the same refines): the two "
    "tables are DIFFERENT experiments, now labeled per row.  The TPU run "
    "has ndev=1, where the block-Jacobi 'diagonal block' is the whole "
    "matrix, so ILU degenerates to a full (stale) LU and converges like "
    "Direct (3 iterations at f32 / tol 1e-5).  The CPU run has ndev=8 "
    "virtual devices, i.e. genuine 8-block Jacobi at f64 / tol 1e-7: at "
    "n=98 it needs 46 iterations, and at n=386 it hits max_steps=3000 "
    "without converging.  The 'block-Jacobi fails to converge at modest N "
    "while stale LU stays at 1-2 iterations' headline therefore stands, "
    "supported by the ndev=8 table; the ndev=1 table cannot measure "
    "block-Jacobi at all."
)

RING_VS_GATHER_CONCLUSION = (
    "Reconciliation of the r3 ring-vs-gather contradiction (BENCH_SCALING "
    "showed ring at 2.6-3.3 GFLOP/s vs gather ~12 while DIAG_DIST wall-times "
    "showed ring 3x FASTER): the two files measured different regimes with "
    "different harnesses — DIAG_DIST timed one eager dispatch per matvec "
    "(dispatch overhead ~ the 2-core host's thread-switch cost, which the "
    "ndev-step fori_loop ring amortizes differently than the one-shot "
    "gather), while this script times jitted steady-state calls; on a "
    "2-core host oversubscribed 8 ways both are scheduler noise past "
    "ndev=2 (DIAG_DIST's own pure-compute control collapses identically). "
    "This file's matvec_s/matvec_ring_s rows, measured in ONE harness, are "
    "the numbers to use.  DEFAULT: the all-gather formulation "
    "(parallel.sharded.sharded_matvec) — one collective of d*n*4 bytes that "
    "XLA schedules asynchronously against the local GEMV, fastest or equal "
    "at every virtual-mesh point and the only one measurable on 1 real "
    "chip.  The ppermute ring (sharded_matvec_ring) is kept for real "
    "multi-chip slices where (a) the replicated x exceeds the VMEM budget "
    "(dn*4B per device), or (b) a profile shows the gather serializing "
    "against the GEMV; on paper the ring hides communication once the "
    "per-step block GEMV time (dn/ndev)^2*4B/HBM_bw exceeds the per-step "
    "transfer (dn/ndev)*4B/ICI_bw, i.e. dn >= ndev * HBM_bw/ICI_bw "
    "(~2*ndev on a v5e: always true at BEM sizes) — so the ring is "
    "expected to win on real ICI and should be re-measured the first time "
    "a multi-chip slice is available; the virtual mesh cannot decide this."
)


def main():
    initialize_multihost()
    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform != "cpu"
    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    base_refine = int(os.environ.get("SCALING_REFINE", "2"))
    rows = []

    if on_tpu:
        # real chips: classic weak scaling, constant pairs/device (quad
        # refinement x16s the pairs, so bump refine every 4x devices)
        for ndev in ndevs:
            refine = base_refine + (1 if ndev >= 4 else 0)
            r = measure(ndev, refine, dtype)
            r["mode"] = "weak"
            rows.append(r)
        base = rows[0]
        for r in rows:
            r["efficiency"] = (r["pairs_per_s"] / r["ndev"]) / base["pairs_per_s"]
            print(
                f"weak  ndev={r['ndev']}: n={r['nodes']} "
                f"{r['pairs_per_s']:.3e} pairs/s  eff {r['efficiency']:.2f}"
            )

    # sharding-overhead sweep (the meaningful metric on the virtual mesh,
    # also a useful diagnostic on real chips): SAME problem on 1..8 devices
    overhead = []
    for ndev in ndevs:
        r = measure(ndev, base_refine, dtype)
        r["mode"] = "overhead"
        overhead.append(r)
    obase = overhead[0]
    for r in overhead:
        # t(1)/t(n) on identical total work and identical silicon; 1.0 =
        # the distribution machinery (slab layout, all-gathers) is free
        r["overhead_efficiency"] = r["pairs_per_s"] / obase["pairs_per_s"]
        print(
            f"overhead ndev={r['ndev']}: n={r['nodes']} "
            f"{r['pairs_per_s']:.3e} pairs/s  t1/tn {r['overhead_efficiency']:.2f} "
            f"matvec {r['matvec_gflops']:.1f} GF/s  "
            f"lu_factor {r['lu_factor_s']*1e3:.0f} ms  "
            f"lu_solve {r['lu_solve_s']*1e3:.1f} ms "
            f"(= {r['lu_solve_vs_2_matvecs']:.1f}x 2 matvecs)"
        )

    iters = stale_lu_vs_block_jacobi()

    # the virtual-mesh run is the canonical multi-device table; a real-chip
    # run (1 device on this rig) gets its own file so it cannot clobber it
    out_name = "BENCH_SCALING_TPU.json" if on_tpu else "BENCH_SCALING.json"
    with open(out_name, "w") as f:
        json.dump(
            dict(
                rows=rows + overhead,
                stale_lu_vs_block_jacobi=iters,
                stale_lu_vs_block_jacobi_note=STALE_LU_VS_BLOCK_JACOBI_NOTE,
                ring_vs_gather_conclusion=RING_VS_GATHER_CONCLUSION,
            ),
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
