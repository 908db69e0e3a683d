"""Distributed frame step (8 virtual devices) vs the single-chip pipeline:
identical rigid velocities for the sphere-translation configuration."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh import read_mesh
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.fem.geometry import euler_from_mesh
from bemstokes_tpu.parallel import row_mesh
from bemstokes_tpu.parallel.solve import make_sharded_frame_step


def test_sharded_frame_step_matches_single_chip(reference_grid_dir):
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(grid_type="Real", force_pole="Origin")
    prob = StokesBEMProblem(mesh, cfg)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)

    # single-chip
    res = prob.solve_frame(euler0, sdot)
    U_ref = res["rigid_velocities"]

    # 8-device sharded step
    dmesh = row_mesh()
    step = make_sharded_frame_step(prob, dmesh)
    U, euler_next, info = step(euler0, sdot)
    U = np.asarray(U)
    assert np.allclose(U, U_ref, atol=1e-7), (U, U_ref)
    exact = (1.0 / 120.0) / cfg.time_step
    assert abs(U[0] - exact) / exact < 2e-2
    # euler advanced by dt * U
    assert np.allclose(
        np.asarray(euler_next),
        np.asarray(euler0) + cfg.time_step * U[None, :3],
        atol=1e-12,
    )


def test_slab_solid_angle_matches_single_chip(reference_grid_dir):
    """The slab-layout K diagonal correction must agree entry-for-entry with
    the single-chip ops.corrections.k_solid_angle_correction."""
    import jax

    from bemstokes_tpu.ops.corrections import k_solid_angle_correction
    from bemstokes_tpu.parallel.sharded import flat_to_slab, padded_rows
    from bemstokes_tpu.parallel.solve import slab_solid_angle_correction

    rng = np.random.default_rng(7)
    n, d = 37, 3  # deliberately not divisible by 8
    K = jnp.asarray(rng.standard_normal((d * n, d * n)))
    K_ref, _ = k_solid_angle_correction(K, n, d)

    dmesh = row_mesh()
    ndev = dmesh.devices.size
    n_pad, nloc = padded_rows(n, dmesh)
    # scatter K rows into slab layout [ndev*d*nloc, d*n]
    K_slab = jnp.zeros((ndev * d * nloc, d * n))
    for a in range(d):
        for i in range(n):
            dev, loc = i // nloc, i % nloc
            K_slab = K_slab.at[dev * d * nloc + a * nloc + loc].set(K[a * n + i])
    K_slab = jax.device_put(
        K_slab,
        jax.sharding.NamedSharding(dmesh, jax.sharding.PartitionSpec("rows", None)),
    )
    K_corr = np.asarray(slab_solid_angle_correction(K_slab, n, d, dmesh))
    for a in range(d):
        for i in range(n):
            dev, loc = i // nloc, i % nloc
            row = K_corr[dev * d * nloc + a * nloc + loc]
            assert np.allclose(row, np.asarray(K_ref[a * n + i]), atol=1e-12)


def test_sharded_jacobi_and_heun(reference_grid_dir):
    """preconditioner_type='Jacobi' runs the distributed diagonal
    preconditioner; sharded_heun_step averages the wrapping 2-frame stroke
    to ~0 like the single-chip Heun test."""
    from bemstokes_tpu.parallel.solve import sharded_heun_step

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    mesh1 = read_mesh(f"{reference_grid_dir}/sphere_translation_1.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        solver=SolverConfig(preconditioner_type="Jacobi", max_steps=3000),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler0 = prob.initial_euler()
    euler1 = jnp.asarray(euler_from_mesh(mesh1.vertices, prob.map_space))
    sdot = prob.shape_velocities_fd(euler0, euler1)

    dmesh = row_mesh()
    step = make_sharded_frame_step(prob, dmesh)
    U, _, info = step(euler0, sdot)
    exact = (1.0 / 120.0) / cfg.time_step
    assert abs(float(U[0]) - exact) / exact < 2e-2

    # Heun over the wrapping 2-frame stroke (corrector at the next frame's
    # geometry with the reversed gait, exactly like the single-chip
    # test_heun_integration): +U and -U average to ~0
    sdot_back = prob.shape_velocities_fd(euler1, euler0)
    U_heun, i1, i2 = sharded_heun_step(
        step, euler0, sdot, euler_pred=euler1, sdot_pred=sdot_back
    )
    assert abs(float(U_heun[0])) < 2e-2 * exact


def test_ring_matvec_matches_gather_matvec():
    """sharded_matvec_ring (ppermute ring over slab-ordered operands, the
    explicit comm/compute-overlap formulation) == sharded_matvec + gather."""
    import numpy as np
    from bemstokes_tpu.parallel.sharded import (
        padded_rows,
        flat_to_slab,
        slab_to_flat,
        sharded_matvec,
        sharded_matvec_ring,
    )
    from bemstokes_tpu.parallel.lu import slab_reorder_columns

    mesh = row_mesh(8)
    d, n = 3, 37
    _, nloc = padded_rows(n, mesh)
    Np = 8 * d * nloc
    rng = np.random.default_rng(3)
    A_slab = jnp.asarray(rng.standard_normal((Np, d * n)))
    x = jnp.asarray(rng.standard_normal(d * n))

    y_ref = slab_to_flat(sharded_matvec(A_slab, x, mesh), n, d, mesh)
    A2 = slab_reorder_columns(A_slab, n, d, mesh)
    y_ring = slab_to_flat(
        sharded_matvec_ring(A2, flat_to_slab(x, n, d, mesh), mesh), n, d, mesh
    )
    assert np.allclose(np.asarray(y_ring), np.asarray(y_ref), atol=1e-10)


def test_distributed_swimmer_loop_matches_single_chip(
    reference_grid_dir, tmp_path
):
    """cfg.distributed routes the FULL SwimmerSimulation frame loop through
    the sharded step (row-sharded assembly, distributed stale-LU GMRES) on
    the 8-virtual-device mesh: identical physics to the single-chip loop,
    complete output set (VTU, txt series, checkpoints)."""
    import os

    import numpy as np

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.swimmer import SwimmerSimulation

    def cfg(distributed):
        return ProblemConfig(
            grid_type="Real",
            force_pole="Origin",
            n_frames=2,
            input_grid_path=f"{reference_grid_dir}/",
            input_grid_base_name="sphere_translation_",
            input_grid_format="msh",
            consider_rigid_displacements=True,
            rigid_displacement_axes=(True, True, True),
            distributed=distributed,
            solver=SolverConfig(preconditioner_type="Direct"),
        )

    sim_d = SwimmerSimulation(cfg(True), output_dir=str(tmp_path / "dist"))
    hist_d = sim_d.run(0, 2)
    sim_s = SwimmerSimulation(cfg(False), output_dir=str(tmp_path / "single"))
    hist_s = sim_s.run(0, 2)

    for hd, hs in zip(hist_d, hist_s):
        np.testing.assert_allclose(
            hd["rigid_velocities"], hs["rigid_velocities"], atol=1e-7
        )
    np.testing.assert_allclose(
        sim_d.state.displacements, sim_s.state.displacements, atol=1e-7
    )
    for f in (
        "stokes_0.vtu",
        "result_1.npz",
        "point_velocities.txt",
        "origin_velocities.txt",
        "center_of_mass_position.txt",
    ):
        assert os.path.exists(tmp_path / "dist" / f), f
    # the txt force sums agree too
    pv_d = np.loadtxt(tmp_path / "dist" / "point_velocities.txt")
    pv_s = np.loadtxt(tmp_path / "single" / "point_velocities.txt")
    np.testing.assert_allclose(pv_d, pv_s, atol=1e-6)
    # stale-LU engaged on the distributed path: second frame reused factors
    assert sim_d._dist_step.stale_state["refactored"] is False


def test_sharded_bie_evaluation_matches_single(reference_grid_dir):
    """Point-sharded field evaluation == the single-device evaluator."""
    import numpy as np

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.postprocess import (
        evaluate_stokes_bie,
        make_bie_evaluator,
        sharded_evaluate_stokes_bie,
    )
    from bemstokes_tpu.physics.rigid import flatten

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg)
    euler = prob.initial_euler()
    res = prob.solve_frame(euler, jnp.zeros((3 * prob.n,)))
    u_flat = flatten(jnp.asarray(res["operators"]["N"][0]))
    f_flat = res["stokes_forces"]

    rng = np.random.default_rng(11)
    pts = jnp.asarray(
        rng.standard_normal((13, 3)) * 0.5
        + np.array([3.0, 0.0, 0.0])  # exterior points (13: pad path)
    )
    ref = np.asarray(
        evaluate_stokes_bie(pts, u_flat, f_flat, euler, prob.tables)
    )
    got = np.asarray(
        sharded_evaluate_stokes_bie(
            pts, u_flat, f_flat, euler, prob.tables, row_mesh(8)
        )
    )
    assert np.allclose(got, ref, atol=1e-12)
    ev = make_bie_evaluator(prob.tables)
    assert np.allclose(
        np.asarray(ev(pts, u_flat, f_flat, euler)), ref, atol=1e-12
    )


def test_distributed_heun_matches_single_chip(reference_grid_dir, tmp_path):
    """Heun predictor-corrector through the distributed frame loop (stale LU
    reused across the two solves per frame) == single-chip Heun."""
    import numpy as np

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.swimmer import SwimmerSimulation

    def cfg(dist):
        return ProblemConfig(
            grid_type="Real",
            force_pole="Origin",
            n_frames=2,
            input_grid_path=f"{reference_grid_dir}/",
            input_grid_base_name="sphere_translation_",
            input_grid_format="msh",
            time_integration="Heun",
            distributed=dist,
            solver=SolverConfig(preconditioner_type="Direct"),
        )

    U = {}
    for dist in (True, False):
        sim = SwimmerSimulation(cfg(dist), str(tmp_path / f"d{dist}"))
        U[dist] = np.asarray(sim.run(0, 1)[0]["rigid_velocities"])
    np.testing.assert_allclose(U[True], U[False], atol=1e-7)


def test_sharded_q2_matches_single_chip(reference_grid_dir):
    """Degree generality of the distributed step: a Q2 field space (the
    sharded assembly, corrections, LU and matvec are degree-agnostic) must
    match the single-chip Q2 solve to 1e-7."""
    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        fe_degree=2,
        map_degree=2,
        solver=SolverConfig(preconditioner_type="Direct", tolerance=1e-10),
    )
    prob = StokesBEMProblem(mesh, cfg)
    assert prob.n > mesh.n_vertices  # Q2: edge + center nodes active
    euler = prob.initial_euler()
    sdot = jnp.zeros((3 * prob.n,))
    res_ref = prob.solve_frame(euler, sdot)
    F_ref = np.asarray(res_ref["rigid_forces_pole"])

    from bemstokes_tpu.parallel.solve import make_sharded_frame_step as _mk

    step = _mk(prob, row_mesh(), return_fields=True)
    _, _, info, fields = step(euler, sdot)
    assert int(info["iterations"]) <= 2
    F = np.asarray(fields["F"])
    assert np.abs(F - F_ref).max() / np.abs(F_ref).max() < 1e-7
    forces = np.asarray(fields["forces"])
    forces_ref = np.asarray(res_ref["stokes_forces"])
    scale = max(np.abs(forces_ref).max(), 1e-30)
    assert np.abs(forces - forces_ref).max() / scale < 1e-7
