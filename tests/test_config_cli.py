"""Config-system tests: reference .prm parsing, JSON round-trip, CLI driver
(reference L8, `source/main.cc`, `declare_parameters` `source/bem_stokes.cc:208-494`)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from bemstokes_tpu.config import ProblemConfig
from bemstokes_tpu.config_io import (
    parse_prm,
    load_config,
    save_config,
    config_from_dict,
    config_to_dict,
)

REFERENCE_PRM = "/root/reference/tests/parameters_test_alpha_box.prm"


def test_parse_reference_prm():
    with open(REFERENCE_PRM) as f:
        cfg = parse_prm(f.read(), dim=3)
    assert cfg.grid_type == "ImposedForce"
    assert cfg.create_box is True
    assert cfg.first_index_box == 0
    assert cfg.monolithic is True
    assert cfg.use_internal_alpha is True
    assert cfg.n_frames == 120
    assert cfg.delta_frame == 1
    assert cfg.quadrature.singular_order == 10
    assert cfg.consider_rigid_rotations is True
    assert cfg.consider_rigid_displacements is False
    assert cfg.initial_quaternion == (1.0, 0.0, 0.0, 0.0)
    assert cfg.input_grid_base_name == "sphere_mesh_3d_"
    assert cfg.input_grid_format == "msh"
    assert cfg.wall_refinement.distance_from_center == pytest.approx(5.0)
    # walls 0-5 enabled, 6-7 off
    assert [w.enabled for w in cfg.walls] == [True] * 6 + [False] * 2
    assert cfg.walls[0].wall_type == "free_surface"
    assert cfg.walls[1].wall_type == "do_nothing"
    assert cfg.walls[0].span == (80.0, 0.0, 80.0)
    assert cfg.walls[4].span == (0.0, 80.0, 80.0)


def test_json_roundtrip(tmp_path):
    cfg = ProblemConfig(n_frames=7, grid_type="Convergence")
    cfg.solver.gmres_restart = 33
    cfg.cylinder.create = True
    cfg.cylinder.radius = 2.5
    p = str(tmp_path / "params.json")
    save_config(cfg, p)
    back = load_config(p)
    assert back.n_frames == 7
    assert back.grid_type == "Convergence"
    assert back.solver.gmres_restart == 33
    assert back.cylinder.create and back.cylinder.radius == 2.5
    assert config_to_dict(back)["n_frames"] == 7


def test_prm_solver_and_fe_sections():
    text = """
subsection BEMStokes::BEMProblem<3>
  set Monolithic resolurion strategy = false
  set Gmres restart evert            = 42
end
subsection Solver
  set Max steps = 500
  set Tolerance = 1e-8
end
subsection Finite Element Stokes
  set Finite element space = FESystem<2,3>[FE_Q<2,3>(2)^3]
end
subsection FlagellarGeometryHandler
  set Flagellar Amplitude = 0.5
  set Flagellar wave number = 2.0
end
"""
    cfg = parse_prm(text)
    assert cfg.monolithic is False
    assert cfg.solver.gmres_restart == 42
    assert cfg.solver.max_steps == 500
    assert cfg.solver.tolerance == pytest.approx(1e-8)
    assert cfg.fe_degree == 2
    assert cfg.use_flagellum_handler is True
    assert cfg.flagellum_params == {"alpha": 0.5, "k": 2.0}


def test_cli_params_template(tmp_path):
    out = str(tmp_path / "t.json")
    env = dict(os.environ, PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-m", "bemstokes_tpu", "params", "-p", out, "--dim", "2"],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    d = json.loads(open(out).read())
    assert d["dim"] == 2
    assert config_from_dict(d).dim == 2


def test_print_matrices_dumps_and_prm_tail_keys(tmp_path, monkeypatch):
    """`print_matrices` writes the reference's five txt dumps
    (`source/bem_stokes.cc:3362-3430`), the Galerkin strategy raises (dead
    experimental code in the reference), and the remaining reference .prm
    keys parse into their fields."""
    import numpy as np
    import jax.numpy as jnp
    import pytest as _pytest

    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.config_io import parse_prm
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.problem import StokesBEMProblem

    prm = """
    set Scaling for monolithic assembling = 2.5
    set Squirmer change the geometry during the stroke = false
    set Save matrices as txt files = true
    set Galerkin Resolution Strategy = true
    set Apply a correction for rigid rotations = true
    set Load and save refinement history in the code = true
    set Number of subdivisions = 2
    set Apply iges manifold to frame tria = true
    """
    cfg = parse_prm(prm)
    assert cfg.assemble_scaling == 2.5
    assert cfg.squirmer_change_geometry is False
    assert cfg.print_matrices is True
    assert cfg.galerkin is True
    assert cfg.rotation_correction is True
    assert cfg.remove_tria_anisotropies is True
    assert cfg.n_subdivisions == 2
    assert cfg.apply_iges_to_frame is True

    mesh = read_mesh(
        "/root/reference/tests/grid_test/sphere_translation_0.msh", dim=3
    )
    with _pytest.raises(NotImplementedError, match="Galerkin"):
        StokesBEMProblem(mesh, ProblemConfig(galerkin=True))

    monkeypatch.chdir(tmp_path)
    cfg2 = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=0,
        force_pole="Origin",
        print_matrices=True,
        solver=SolverConfig(solve_directly=True),
    )
    prob = StokesBEMProblem(mesh, cfg2)
    prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    for f in (
        "monolithic_matrix.txt",
        "V_matrix.txt",
        "K_matrix.txt",
        "Mass_matrix.txt",
        "normals_matrix.txt",
    ):
        assert (tmp_path / f).exists(), f
    M = np.loadtxt(tmp_path / "Mass_matrix.txt")
    assert M.shape == (prob.n, prob.n)
    assert np.allclose(M, M.T, atol=1e-12)  # consistent mass is symmetric
