"""Multi-frame swimmer simulation over the sphere-translation gait +
restart + composer (reference `run()` and `composer` flows).  The gait has
two frames (sphere shifted by 1/120 in x); with n_frames=2 the stroke wraps,
so frame 0 -> 1 gives +U and frame 1 -> 0 gives -U."""

import os

import numpy as np
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.swimmer import SwimmerSimulation, SwimmerState


def make_cfg(reference_grid_dir, **kw):
    defaults = dict(
        grid_type="Real",
        force_pole="Origin",
        n_frames=2,
        input_grid_path=f"{reference_grid_dir}/",
        input_grid_base_name="sphere_translation_",
        input_grid_format="msh",
        consider_rigid_displacements=True,
        rigid_displacement_axes=(True, True, True),
        solver=SolverConfig(solve_directly=True),
    )
    defaults.update(kw)
    return ProblemConfig(**defaults)


def test_full_stroke_and_restart(reference_grid_dir, tmp_path):
    cfg = make_cfg(reference_grid_dir)
    sim = SwimmerSimulation(cfg, output_dir=str(tmp_path))
    hist = sim.run(0, 2)
    assert len(hist) == 2
    exact = (1.0 / 120.0) / cfg.time_step
    assert abs(hist[0]["rigid_velocities"][0] - exact) / exact < 2e-2
    assert abs(hist[1]["rigid_velocities"][0] + exact) / exact < 2e-2
    # displacement after the full (closed) stroke cancels to ~0
    disp = sim.state.displacements
    body = sim.map_body_mask[:, 0] > 0
    assert np.max(np.abs(disp[body, 0])) < 1e-4
    # outputs
    assert os.path.exists(tmp_path / "result_0.npz")
    assert os.path.exists(tmp_path / "stokes_1.vtu")
    assert os.path.exists(tmp_path / "point_velocities.txt")

    # restart from the saved state after frame 0
    st = SwimmerState.load(str(tmp_path / "state_0.npz"))
    expected = cfg.time_step * exact
    assert np.allclose(st.displacements[body, 0], expected, rtol=3e-2)
    cfg2 = make_cfg(reference_grid_dir, use_previous_state=True)
    sim2 = SwimmerSimulation(cfg2, output_dir=str(tmp_path))
    hist2 = sim2.run(1, 2)
    assert abs(hist2[0]["rigid_velocities"][0] + exact) / exact < 2e-2

    # composer over the stroke
    mean_U = sim.compose(0, 2)
    assert abs(mean_U[0]) < 2e-2 * exact  # closed stroke: zero mean
    assert os.path.exists(tmp_path / "composed_1.vtu")


def test_heun_integration(reference_grid_dir, tmp_path):
    cfg = make_cfg(
        reference_grid_dir,
        time_integration="Heun",
        consider_rigid_displacements=False,
    )
    s = SwimmerSimulation(cfg, output_dir=str(tmp_path))
    hist = s.run(0, 1)
    exact = (1.0 / 120.0) / cfg.time_step
    # Heun over the wrapping 2-frame stroke averages +U (frame 0) and the
    # predictor's -U (frame 1) contributions to ~0
    U_mean = hist[0]["rigid_velocities"][0]
    assert abs(U_mean) < 2e-2 * exact, U_mean
