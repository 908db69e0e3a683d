"""Near-contact validation (VERDICT r4 ask #3): sphere-above-wall gap
sweeps against Brenner's EXACT perpendicular-drag series, a two-sphere
approach against the Stimson-Jeffery exact co-moving solution, and the
quadrature auto-promotion semantics (mesh/proximity.py).

Measured findings encoded here (see also scripts/near_contact_sweep.py for
the on-chip accuracy-vs-cost record): down to gap = 0.1a the solver tracks
the exact curves with errors set by MESH RESOLUTION, not quadrature (order
2 == order 8 to ~5e-4 relative at refine 2); what auto-promotion buys is
full-order accuracy from a cheap far rule — the promoted order-2 config
recovers the order-8 answer to ~1e-4 while unpromoted order 2 does not.

The reference's only near-contact tool is geometric `refine_walls`
(`source/bem_stokes.cc:1478-1519`) with one global quadrature order
(`:4912-5026`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import (
    ProblemConfig,
    QuadratureConfig,
    SolverConfig,
    WallConfig,
)
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.problem import StokesBEMProblem

SPHERE0 = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def brenner_lambda(H, terms=5000):
    """Sphere translating PERPENDICULAR to a rigid plane wall: exact drag
    correction F = 6 pi mu a U * lambda (Brenner 1961), H = center height /
    radius.  Exponentially-scaled terms (no overflow at large H)."""
    al = np.arccosh(np.float64(H))
    n = np.arange(1, terms + 1, dtype=np.float64)
    k = 2 * n + 1
    e = np.exp(-k * al)
    sha, sh2a = np.sinh(al), np.sinh(2 * al)
    num = (1 - e * e) + k * sh2a * e
    den = (1 - e) ** 2 - (k * sha) ** 2 * e
    return (
        (4.0 / 3.0)
        * sha
        * np.sum(n * (n + 1) / ((2 * n - 1) * (2 * n + 3)) * (num / den - 1))
    )


def stimson_jeffery_lambda(Hd, terms=5000):
    """Two equal spheres translating with EQUAL velocity along their line
    of centers: exact per-sphere drag correction (Stimson & Jeffery 1926),
    Hd = d / (2a) with d the center separation.  lambda -> 0.6452 at
    contact — the classical value."""
    al = np.arccosh(np.float64(Hd))
    n = np.arange(1, terms + 1, dtype=np.float64)
    k = 2 * n + 1
    e = np.exp(-k * al)
    sha, sh2a = np.sinh(al), np.sinh(2 * al)
    den = (1 - e * e) + k * sh2a * e
    num = (1 - e) ** 2 - (k * sha) ** 2 * e
    return (
        (4.0 / 3.0)
        * sha
        * np.sum(n * (n + 1) / ((2 * n - 1) * (2 * n + 3)) * (1.0 - num / den))
    )


def test_exact_series_sanity():
    """The truth curves themselves: free-space limits and lubrication /
    contact asymptotics."""
    assert abs(brenner_lambda(100.0) - 1.0) < 2e-2
    # lubrication: lambda * eps -> 1 as the gap eps -> 0
    assert abs(brenner_lambda(1.001) * 0.001 - 1.0) < 5e-3
    assert abs(stimson_jeffery_lambda(50.0) - 1.0) < 2e-2
    # classical contact value 0.6452
    assert abs(stimson_jeffery_lambda(1.0001) - 0.6452) < 1e-3


def _wall_problem(mesh, H, quadrature=None):
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=1,  # motion toward the wall (perpendicular)
        force_pole="Origin",
        no_slip_kernel=True,  # Blake image wall: exact, no wall mesh
        body_manifold="sphere",
        walls=(
            WallConfig(
                enabled=False,
                position=(0.0, -H, 0.0),
                span=(10.0, 0.0, 10.0),
            ),
        ),
        quadrature=quadrature or QuadratureConfig(),
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    return StokesBEMProblem(mesh, cfg)


def _solve_lambda(prob, component=1, n_bodies=1):
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    F = np.asarray(res["rigid_forces_pole"])
    return abs(F[component]) / (n_bodies * 6 * np.pi)


@pytest.mark.parametrize(
    "H,tol",
    [(2.0, 1.2e-2), (1.5, 2e-2), (1.2, 5e-2)],
)
def test_wall_gap_sweep_vs_brenner(H, tol):
    """Perpendicular sphere-wall drag tracks the exact Brenner curve as the
    gap closes (refine-1 mesh; measured errors 5.5e-3 / 8.8e-3 / 2.4e-2 —
    discretization-limited, so tolerances sit ~2x above)."""
    mesh = refine_uniform(
        read_mesh(SPHERE0, dim=3), SphericalManifold(), times=1
    )
    lam = _solve_lambda(_wall_problem(mesh, H))
    truth = brenner_lambda(H)
    assert abs(lam - truth) / truth < tol


def test_auto_promotion_trigger_and_recovery():
    """(a) the promotion triggers exactly when the image gap drops below
    the local panel diameter; (b) a promoted cheap far rule recovers the
    full-order answer: at H=1.05 / refine 1 the order-2 run moves from
    17.8219 (unpromoted) to 17.8314 with promotion vs 17.8310 at uniform
    order 8 — i.e. the near-pair COO correction supplies the missing
    quadrature accuracy."""
    mesh = refine_uniform(
        read_mesh(SPHERE0, dim=3), SphericalManifold(), times=1
    )
    # far gap: no trigger
    p_far = _wall_problem(mesh, 2.0)
    assert not p_far.quadrature_promoted
    # tight gap: trigger (2*(H-1) = 0.1 < refine-1 panel diameter ~0.35)
    H = 1.05
    p2_plain = _wall_problem(
        mesh, H, QuadratureConfig(order=2, auto_promote=False)
    )
    assert not p2_plain.quadrature_promoted
    p2_auto = _wall_problem(
        mesh, H, QuadratureConfig(order=2, auto_promote=True, promote_boost=6)
    )
    assert p2_auto.quadrature_promoted
    p8 = _wall_problem(mesh, H, QuadratureConfig(order=8, auto_promote=False))

    lam_plain = _solve_lambda(p2_plain)
    lam_auto = _solve_lambda(p2_auto)
    lam_full = _solve_lambda(p8)
    # promoted order-2 == order-8 to 1e-4; unpromoted is 5x+ further away
    assert abs(lam_auto - lam_full) / lam_full < 1e-4
    assert abs(lam_plain - lam_full) > 3 * abs(lam_auto - lam_full)


@pytest.mark.parametrize("d,tol", [(3.0, 2e-2), (2.2, 2e-2)])
def test_two_sphere_approach_vs_stimson_jeffery(d, tol):
    """Two co-moving spheres along their line of centers vs the exact
    Stimson-Jeffery drag (measured 8.2e-3 / 8.4e-3 at 98 nodes/sphere);
    the d=2.2 configuration (gap 0.2a) must auto-promote."""
    from bemstokes_tpu.mesh.factories import create_body_in_code

    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        build_sphere_in_code=True,
        internal_sphere_refinements=2,
        two_spheres=True,
        spheres_distance=d,
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    mesh = create_body_in_code(cfg)
    prob = StokesBEMProblem(mesh, cfg)
    if d <= 2.4:
        assert prob.quadrature_promoted
    lam = _solve_lambda(prob, component=0, n_bodies=2)
    truth = stimson_jeffery_lambda(d / 2.0)
    assert abs(lam - truth) / truth < tol
