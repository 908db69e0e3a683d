"""Scaling benchmark over a 1/2/4/8-device row mesh.

Weak scaling for a dense N^2 BEM operator means constant PAIRS PER DEVICE:
the mesh for ndev devices is refined so n(ndev) ~ n(1) * sqrt(ndev).  Strong
scaling (fixed N) is also reported.  Efficiency = throughput / (ndev *
throughput at 1 device).

Run on the virtual CPU mesh (numbers validate the SCALING, not per-chip
speed-of-light — that is bench.py's job on the real chip):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py

On a real multi-chip/multi-host slice, run the same script under
`bemstokes_tpu.parallel.initialize_multihost()` (JAX_* env vars set by the
launcher) and the row mesh spans every chip.
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
    pairs = float(n) * float(Nc)
    return dict(
        ndev=ndev,
        nodes=n,
        panels=Nc,
        pairs_per_s=pairs / t_asm,
        matvec_gflops=2.0 * (3.0 * n) * (V.shape[0]) / t_mv / 1e9,
    )


def main():
    initialize_multihost()
    dtype = jnp.float32
    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    # weak scaling: pairs/device constant -> refine so n ~ n0 * sqrt(ndev);
    # quad refinement quadruples panels, so bump refine every 4x devices
    base_refine = int(os.environ.get("SCALING_REFINE", "1"))
    rows = []
    for ndev in ndevs:
        refine = base_refine + (1 if ndev >= 4 else 0)
        r = measure(ndev, refine, dtype)
        r["mode"] = "weak"
        rows.append(r)
        print(
            f"weak  ndev={ndev}: n={r['nodes']} {r['pairs_per_s']:.3e} pairs/s "
            f"{r['matvec_gflops']:.1f} GF/s"
        )
    base = rows[0]
    for r in rows:
        # weak efficiency: pairs/s per device, normalized by the 1-device run
        r["efficiency"] = (r["pairs_per_s"] / r["ndev"]) / base["pairs_per_s"]
        print(f"weak  ndev={r['ndev']}: efficiency {r['efficiency']:.2f}")

    strong = []
    for ndev in ndevs:
        r = measure(ndev, base_refine + 1, dtype)
        r["mode"] = "strong"
        strong.append(r)
        print(
            f"strong ndev={ndev}: {r['pairs_per_s']:.3e} pairs/s "
            f"{r['matvec_gflops']:.1f} GF/s"
        )
    sbase = strong[0]
    for r in strong:
        r["efficiency"] = r["pairs_per_s"] / (r["ndev"] * sbase["pairs_per_s"])
        print(f"strong ndev={r['ndev']}: efficiency {r['efficiency']:.2f}")

    with open("BENCH_SCALING.json", "w") as f:
        json.dump(rows + strong, f, indent=2)


if __name__ == "__main__":
    main()
