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


def _timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
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
    from bemstokes_tpu.parallel.lu import slab_reorder_columns

    A2 = slab_reorder_columns(V, n, 3, dmesh)
    x_slab = flat_to_slab(x, n, 3, dmesh)
    mv_ring = jax.jit(lambda A, v: sharded_matvec_ring(A, v, dmesh))
    t_ring = _timed(mv_ring, A2, x_slab, reps=10)
    pairs = float(n) * float(Nc)
    return dict(
        ndev=ndev,
        nodes=n,
        panels=Nc,
        pairs_per_s=pairs / t_asm,
        matvec_gflops=2.0 * (3.0 * n) * (V.shape[0]) / t_mv / 1e9,
        matvec_ring_gflops=2.0 * (3.0 * n) * (V.shape[0]) / t_ring / 1e9,
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
            f"matvec {r['matvec_gflops']:.1f} GF/s"
        )

    with open("BENCH_SCALING.json", "w") as f:
        json.dump(rows + overhead, f, indent=2)


if __name__ == "__main__":
    main()
