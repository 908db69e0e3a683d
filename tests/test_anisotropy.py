"""`remove_tria_anisotropies`: anisotropic cut_x/cut_y removal of elongated
quads (reference `GridTools::remove_anisotropy` in `read_domain`,
`source/bem_stokes.cc:662-664`, and per frame tria `:2305-2307`), plus the
iges-flag gate."""

import numpy as np
import pytest

from bemstokes_tpu.mesh.refine import remove_anisotropy, _anisotropy_cuts
from bemstokes_tpu.mesh.surface_mesh import SurfaceMesh


def _strip(lx=4.0, nz=1):
    """One quad of aspect ratio lx (long in parametric x), embedded in 3D."""
    v = np.array(
        [[0.0, 0.0, 0.0], [lx, 0.0, 0.0], [0.0, 1.0, 0.0], [lx, 1.0, 0.0]]
    )
    return SurfaceMesh(v, np.array([[0, 1, 2, 3]], np.int32), np.zeros(1, np.int32))


def _aspects(mesh):
    V, C = mesh.vertices, mesh.cells
    lx = 0.5 * (
        np.linalg.norm(V[C[:, 1]] - V[C[:, 0]], axis=1)
        + np.linalg.norm(V[C[:, 3]] - V[C[:, 2]], axis=1)
    )
    ly = 0.5 * (
        np.linalg.norm(V[C[:, 2]] - V[C[:, 0]], axis=1)
        + np.linalg.norm(V[C[:, 3]] - V[C[:, 1]], axis=1)
    )
    return np.maximum(lx / ly, ly / lx)


def test_remove_anisotropy_bounds_aspect_ratio():
    mesh, plan = remove_anisotropy(_strip(4.0))
    assert len(plan) == 2  # 4:1 -> 2:1 -> 1:1
    assert mesh.n_cells == 4
    assert _aspects(mesh).max() < 1.6180339887
    assert mesh.edge_midpoints is not None and len(mesh.edge_midpoints) > 0
    # cells tile the strip exactly (area conserved)
    assert mesh.vertices[:, 0].max() == 4.0

    # cut_y branch: long in parametric y
    v = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 4.0, 0.0], [1.0, 4.0, 0.0]]
    )
    tall = SurfaceMesh(v, np.array([[0, 1, 2, 3]], np.int32), np.zeros(1, np.int32))
    assert _anisotropy_cuts(tall, 1.618)[0] == 2
    mesh2, _ = remove_anisotropy(tall)
    assert mesh2.n_cells == 4 and _aspects(mesh2).max() < 1.618


def test_remove_anisotropy_plan_replay_same_topology():
    """Replaying the frame-0 plan on a different-geometry frame yields the
    SAME connectivity (gait frames must share one topology)."""
    m0, plan = remove_anisotropy(_strip(4.0))
    # frame 1: slightly deformed gait geometry, same base topology
    strip1 = _strip(4.0)
    strip1.vertices[:, 2] += 0.3 * np.sin(strip1.vertices[:, 0])
    m1, plan1 = remove_anisotropy(strip1, plan=plan)
    assert np.array_equal(m0.cells, m1.cells)
    assert len(plan1) == len(plan)
    # no-op on an isotropic mesh
    sq = SurfaceMesh(
        np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0], [1.0, 1, 0]]),
        np.array([[0, 1, 2, 3]], np.int32),
        np.zeros(1, np.int32),
    )
    same, empty = remove_anisotropy(sq)
    assert same.n_cells == 1 and empty == []


def test_remove_anisotropy_hanging_against_uncut_neighbor():
    """An elongated quad next to a square: the cut midpoints hang on the
    shared edge and are picked up by the exact constraint builder."""
    from bemstokes_tpu.mesh.constraints import hanging_node_constraints

    # square [0,1]^2 + 4x1 strip above it sharing edge (2,3): the strip is
    # long in x and will be cut; the new midpoint on the shared edge hangs
    v = np.array(
        [
            [0.0, 0.0, 0.0],
            [4.0, 0.0, 0.0],
            [0.0, 4.0, 0.0],
            [4.0, 4.0, 0.0],
            [0.0, 5.0, 0.0],
            [4.0, 5.0, 0.0],
        ]
    )
    cells = np.array([[0, 1, 2, 3], [2, 3, 4, 5]], np.int32)
    mesh = SurfaceMesh(v, cells, np.zeros(2, np.int32))
    cut, plan = remove_anisotropy(mesh)
    assert len(plan) >= 1
    hc = hanging_node_constraints(cut)
    assert hc.n > 0
    # every hanging node interpolates its parent edge midpoint exactly
    for s, ms, ws in zip(hc.slaves, hc.masters, hc.weights):
        interp = (cut.vertices[ms] * ws[:, None]).sum(axis=0)
        assert np.allclose(cut.vertices[s], interp, atol=1e-12)


def test_swimmer_wiring_and_iges_gate(tmp_path):
    """cfg.remove_tria_anisotropies flows through SwimmerSimulation's mesh
    reads (no-op plan on the isotropic sphere gait, topology preserved
    across frames); the iges flags raise like galerkin."""
    import jax.numpy as jnp

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.swimmer import SwimmerSimulation

    cfg = ProblemConfig(
        grid_type="Real",
        force_pole="Origin",
        input_grid_path="/root/reference/tests/grid_test/",
        input_grid_base_name="sphere_translation_",
        n_frames=2,
        remove_tria_anisotropies=True,
        solver=SolverConfig(solve_directly=True),
    )
    sim = SwimmerSimulation(cfg, str(tmp_path))
    assert sim._aniso_plan == []  # isotropic gait: decided, no cuts
    m1 = sim._read_frame_mesh(1)
    assert np.array_equal(m1.cells, sim.mesh.cells)
    hist = sim.run(0, 1)
    assert np.isfinite(hist[0]["rigid_velocities"]).all()

    mesh = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    with pytest.raises(NotImplementedError, match="iges"):
        StokesBEMProblem(mesh, ProblemConfig(apply_iges_to_frame=True))
    with pytest.raises(NotImplementedError, match="iges"):
        StokesBEMProblem(mesh, ProblemConfig(apply_iges_to_reference=True))
