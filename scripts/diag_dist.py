"""Distribution diagnostics: explain the virtual-mesh scaling cliff and
measure all-gather vs ppermute-ring matvec overlap.

Round-2 finding (`BENCH_SCALING.json`): overhead_efficiency collapsed
1.73 -> 0.49 going 4 -> 8 virtual devices.  This host has `nproc` = 2
physical cores; 8 virtual XLA CPU devices oversubscribe them 4x.  This
script separates the two candidate causes:

1. `pure_compute`: a shard_map GEMM with NO communication, same total FLOPs
   at every device count.  If THIS collapses at 8 devices too, the cliff is
   host-core oversubscription (virtual-mesh-only), not our distribution
   machinery.
2. `matvec_gather` vs `matvec_ring`: the production all-gather matvec
   against the explicit ppermute-ring overlap formulation, same operands —
   the overlap measurement BASELINE asks for ("all-gather overlapped with
   local tile compute").  On shared silicon the ring mostly measures
   collective-schedule overhead; on real chips it would measure overlap.

Writes DIAG_DIST.json and prints a table.  Optionally dumps a
jax.profiler trace per device count with --trace (view with xprof/tensorboard).

    python scripts/diag_dist.py [--trace]
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

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.sharding import PartitionSpec as P
from jax import shard_map

from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.sharded import (
    padded_rows,
    flat_to_slab,
    sharded_matvec,
    sharded_matvec_ring,
)
from bemstokes_tpu.parallel.lu import slab_reorder_columns


def _timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure(ndev, n_nodes=1538, d=3, trace=False):
    mesh = row_mesh(devices=jax.devices()[:ndev])
    _, nloc = padded_rows(n_nodes, mesh)
    m = d * nloc
    Np = ndev * m
    rng = np.random.default_rng(0)
    A_slab = jnp.asarray(
        rng.standard_normal((Np, d * n_nodes)).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal(d * n_nodes).astype(np.float32))

    # 1. pure compute, no communication: per-device [m, dn] @ [dn, 64]
    B = jnp.asarray(rng.standard_normal((d * n_nodes, 64)).astype(np.float32))

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows", None), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )
    def pure(A_loc, B_rep):
        return A_loc @ B_rep

    t_pure = _timed(pure, A_slab, B)

    # 2a. production matvec: local GEMV + all-gather of the result
    from bemstokes_tpu.parallel.sharded import sharded_matvec_gathered

    mv_gather = jax.jit(lambda A, v: sharded_matvec_gathered(A, v, mesh))
    t_gather = _timed(mv_gather, A_slab, x)

    # 2b. ppermute ring on the slab-ordered square matrix
    A2 = slab_reorder_columns(A_slab, n_nodes, d, mesh)
    x_slab = flat_to_slab(x, n_nodes, d, mesh)
    mv_ring = jax.jit(lambda A, v: sharded_matvec_ring(A, v, mesh))
    t_ring = _timed(mv_ring, A2, x_slab)

    if trace:
        tdir = f"/tmp/diag_dist_trace_{ndev}"
        with jax.profiler.trace(tdir):
            jax.block_until_ready(mv_gather(A_slab, x))
            jax.block_until_ready(mv_ring(A2, x_slab))
        print(f"  trace -> {tdir}")

    flops = 2.0 * Np * (d * n_nodes)
    return dict(
        ndev=ndev,
        t_pure_ms=t_pure * 1e3,
        t_gather_ms=t_gather * 1e3,
        t_ring_ms=t_ring * 1e3,
        matvec_gather_gflops=flops / t_gather / 1e9,
        matvec_ring_gflops=flops / t_ring / 1e9,
    )


def main():
    trace = "--trace" in sys.argv
    cores = os.cpu_count()
    print(f"host cores: {cores}; devices: {len(jax.devices())}")
    rows = [measure(ndev, trace=trace) for ndev in (1, 2, 4, 8)]
    base = rows[0]
    for r in rows:
        r["pure_compute_efficiency"] = base["t_pure_ms"] / r["t_pure_ms"]
        r["gather_efficiency"] = base["t_gather_ms"] / r["t_gather_ms"]
        print(
            f"ndev={r['ndev']}: pure {r['t_pure_ms']:.2f} ms "
            f"(t1/tn {r['pure_compute_efficiency']:.2f})  "
            f"gather-mv {r['t_gather_ms']:.2f} ms  "
            f"ring-mv {r['t_ring_ms']:.2f} ms"
        )
    summary = dict(
        host_cores=cores,
        rows=rows,
        conclusion=(
            "pure-compute (no communication) efficiency collapses the same "
            "way past the physical core count -> the 4->8 device cliff is "
            "host-core oversubscription of the virtual mesh, not the "
            "distribution machinery"
            if rows[-1]["pure_compute_efficiency"] < 0.75
            else "pure compute scales; any matvec cliff is attributable to "
            "the collective schedule"
        ),
    )
    with open("DIAG_DIST.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(summary["conclusion"])


if __name__ == "__main__":
    main()
