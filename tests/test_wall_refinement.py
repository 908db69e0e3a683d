"""`refine_walls` wired into the pipeline (reference `read_domain` applies it
right after the wall factories, `source/bem_stokes.cc:806, 1478-1519`) + the
per-component solid-angle correction that makes resolved OPEN walls give
sane physics.

Physics anchor: a unit sphere translating parallel to a plane no-slip wall
at height h has drag F = 6 pi mu U / (1 - 9/16 l + l^3/8 - 45/256 l^4 -
l^5/16), l = a/h (Lorentz/Faxen wall correction — the same anchor as the
Blake-image solve in test_image_kernel_solves).  A resolved FINITE wall must
approach that from BELOW (less blockage than the infinite wall)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import (
    ProblemConfig,
    SolverConfig,
    WallConfig,
    WallRefinementConfig,
)
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.mesh.factories import add_walls_to_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"
H = 2.0
LAM = 1.0 / H
LORENTZ = 6.0 * np.pi / (
    1.0 - 9.0 / 16.0 * LAM + LAM**3 / 8.0 - 45.0 / 256.0 * LAM**4 - LAM**5 / 16.0
)


def _drag(wall_refinement, alpha_row_sum="component"):
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        body_manifold="sphere",
        alpha_row_sum=alpha_row_sum,
        walls=(
            WallConfig(
                enabled=True,
                wall_type="no_slip",
                position=(0.0, -H, 0.0),
                span=(12.0, 0.0, 12.0),
            ),
        ),
        wall_refinement=wall_refinement,
        solver=SolverConfig(solve_directly=True),
    )
    mesh = read_mesh(SPHERE, dim=3)
    mesh = refine_uniform(mesh, SphericalManifold(), times=1)
    mesh = add_walls_to_mesh(mesh, cfg)
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    F = float(
        jnp.dot(
            flatten(jnp.asarray(res["operators"]["N_dual"][0])),
            res["stokes_forces"],
        )
    )
    return abs(F), prob, res


def test_refined_wall_drag_beats_unrefined_vs_lorentz():
    """cfg.wall_refinement.enabled refines wall cells near the body inside
    add_walls_to_mesh; the hanging nodes it creates are constrained in the
    solve, and the locally-refined wall recovers the Lorentz drag far better
    than the coarse wall."""
    F_coarse, prob_c, _ = _drag(WallRefinementConfig())
    assert prob_c.hanging.n == 0

    wr = WallRefinementConfig(
        enabled=True, threshold=1.0, distance_from_center=6.0
    )
    F_fine, prob_f, res_f = _drag(wr)
    assert prob_f.hanging.n > 0  # local refinement -> hanging nodes active
    assert res_f["residual"] < 1e-8

    err_coarse = abs(F_coarse - LORENTZ) / LORENTZ
    err_fine = abs(F_fine - LORENTZ) / LORENTZ
    # measured: 25.26 (3.3%) coarse -> 25.95 (0.66%) refined vs 26.128
    assert err_fine < 0.5 * err_coarse, (F_coarse, F_fine, LORENTZ)
    assert err_fine < 2e-2
    # a finite wall cannot out-block the infinite wall
    assert F_fine < LORENTZ and F_coarse < LORENTZ


def test_component_alpha_fixes_open_wall_diagonal():
    """The reference's full-row versor correction (`source/bem_stokes.cc:
    3044-3098`) folds an open wall's partial solid angle into the body
    diagonal of K — the constant-field identity it relies on only holds on
    closed boundaries.  With a resolved wall at h=2 that inflates the drag
    ~38% above the infinite-wall Lorentz limit; the per-component row sum
    (alpha=1 closed body, 1/2 open flat wall) restores sane physics."""
    wr = WallRefinementConfig(
        enabled=True, threshold=1.0, distance_from_center=6.0
    )
    F_full, _, _ = _drag(wr, alpha_row_sum="full")
    F_comp, _, _ = _drag(wr, alpha_row_sum="component")
    assert F_full > 1.2 * LORENTZ  # the parity behavior: unphysically high
    assert abs(F_comp - LORENTZ) / LORENTZ < 2e-2


def test_component_alpha_noop_on_closed_single_body():
    """On a single closed component the restricted row sum IS the full row
    sum: both modes must agree to round-off."""
    res = {}
    for mode in ("full", "component"):
        cfg = ProblemConfig(
            grid_type="ImposedVelocity",
            imposed_component=0,
            force_pole="Origin",
            alpha_row_sum=mode,
            solver=SolverConfig(solve_directly=True),
        )
        mesh = read_mesh(SPHERE, dim=3)
        prob = StokesBEMProblem(mesh, cfg)
        r = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
        res[mode] = np.asarray(r["rigid_velocities"])
    assert np.allclose(res["full"], res["component"], atol=1e-12)


def test_component_closedness_detection():
    """cell_components_and_closedness: sphere closed, wall open, the merged
    mesh has two components, and local refinement (hanging nodes) does not
    break the closedness of the refined component."""
    from bemstokes_tpu.mesh.surface_mesh import cell_components_and_closedness
    from bemstokes_tpu.mesh.factories import create_wall, create_sphere

    sphere = create_sphere(refinements=1)
    lab, closed = cell_components_and_closedness(sphere)
    assert closed.tolist() == [True]

    wall = create_wall((0.0, -2.0, 0.0), (4.0, 0.0, 4.0))
    lab, closed = cell_components_and_closedness(wall)
    assert closed.tolist() == [False]

    both = sphere.merged_with(wall)
    lab, closed = cell_components_and_closedness(both)
    assert len(closed) == 2 and sorted(closed.tolist()) == [False, True]

    # locally refined sphere: hanging nodes, still one CLOSED component
    refined = refine_uniform(
        sphere,
        SphericalManifold(),
        cell_filter=np.arange(sphere.n_cells) < 3,
    )
    lab, closed = cell_components_and_closedness(refined)
    assert closed.tolist() == [True]
