"""Prolate-spheroid (lambda=2) mobility validation vs the exact Oberbeck
drag, and the n_cycles convergence-study harness (BASELINE.md validation
configs; reference `V_test_with_Green.cc:68-204`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig, QuadratureConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh
from bemstokes_tpu.mesh.refine import refine_uniform, SpheroidManifold, SphericalManifold
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"


def oberbeck_drag(a, b, axial: bool):
    """Exact Stokes drag of a prolate spheroid (semi-axes a > b = c)
    translating along (axial) or across the symmetry axis, mu = U = 1."""
    e = np.sqrt(1.0 - (b / a) ** 2)
    L = np.log((1.0 + e) / (1.0 - e))
    if axial:
        return 16.0 * np.pi * a * e**3 / ((1.0 + e * e) * L - 2.0 * e)
    return 32.0 * np.pi * a * e**3 / ((3.0 * e * e - 1.0) * L + 2.0 * e)


def _spheroid_mesh(refine=1):
    mesh = read_mesh(SPHERE, dim=3)
    man = SpheroidManifold(radii=(2.0, 1.0, 1.0))
    verts = mesh.vertices * np.array([2.0, 1.0, 1.0])
    mesh = SurfaceMesh(verts, mesh.cells, mesh.material_id)
    return refine_uniform(mesh, man, times=refine)


@pytest.mark.parametrize("component,axial", [(0, True), (1, False)])
def test_spheroid_mobility_oberbeck(component, axial):
    mesh = _spheroid_mesh(refine=1)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=component,
        force_pole="Origin",
        map_degree=3,
        body_manifold="spheroid",
        body_manifold_radii=(2.0, 1.0, 1.0),
        quadrature=QuadratureConfig(order=5, singular_order=8),
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    F = abs(
        float(
            jnp.dot(
                flatten(jnp.asarray(res["operators"]["N_dual"][component])),
                res["stokes_forces"],
            )
        )
    )
    exact = oberbeck_drag(2.0, 1.0, axial)
    assert F == pytest.approx(exact, rel=2e-3)


def test_convergence_study_rates(reference_grid_dir):
    """The harness must show a convergent Green-recovery error with a
    positive rate over n_cycles refinements (reference ParsedConvergenceTable
    over n_cycles, `V_test_with_Green.cc:94`)."""
    from bemstokes_tpu.convergence import convergence_study, format_table

    mesh = read_mesh(
        f"{reference_grid_dir}/sphere_0.inp", dim=3, force_material=0
    )
    rows = convergence_study(
        mesh,
        3,
        (0.3, 0.3, 0.3),
        n_cycles=4,
        manifold=SphericalManifold(),
    )
    table = format_table(rows)
    assert "rate" in table
    errs = [r.error for r in rows]
    assert all(e2 < e1 for e1, e2 in zip(errs, errs[1:]))
    # asymptotic first-order-or-better collocation convergence (the first
    # cycles on the 26-node base mesh are preasymptotic)
    assert rows[3].rate > 0.8, table


def test_convergence_cli(tmp_path, reference_grid_dir, capsys):
    """`bemstokes convergence` wires cfg.n_cycles end-to-end."""
    import json
    from bemstokes_tpu.cli import main

    params = tmp_path / "p.json"
    params.write_text(
        json.dumps(
            dict(
                input_grid_path=f"{reference_grid_dir}/",
                input_grid_base_name="sphere_",
                input_grid_format="inp",
                n_cycles=2,
                body_manifold="sphere",
                body_manifold_radius=None,
            )
        )
    )
    rc = main(["convergence", "-p", str(params), "-o", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cycle" in out and out.count("\n") >= 3
