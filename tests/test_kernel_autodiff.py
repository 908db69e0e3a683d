"""AD kernel derivatives (the reference's Sacado family, `source/kernel.cc:
87-187`) checked against finite differences and closed-form identities."""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.kernels.stokeslet import stokeslet_G, stresslet_W
from bemstokes_tpu.kernels.autodiff import (
    grad_stokeslet_G,
    stokeslet_pressure,
    stokeslet_stress,
)
from bemstokes_tpu.kernels.helpers import impose_G_as_velocity, impose_G_as_trace


def test_grad_G_matches_fd():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(5, 3)) + 2.0)
    g = np.asarray(grad_stokeslet_G(p))  # [5, 3, 3, 3]
    h = 1e-6
    for k in range(3):
        dp = np.zeros(3)
        dp[k] = h
        fd = (np.asarray(stokeslet_G(p + dp)) - np.asarray(stokeslet_G(p - dp))) / (
            2 * h
        )
        assert np.allclose(g[..., k], fd, atol=1e-7)


def test_stokeslet_stress_equals_stresslet():
    """Closed form: sigma_ijk of the Stokeslet = -3 p_i p_j p_k / (4 pi R^5),
    which is exactly the (fully symmetric) stresslet W."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(7, 3)) + 1.5)
    sig = np.asarray(stokeslet_stress(p))
    W = np.asarray(stresslet_W(p))
    assert np.allclose(sig, W, atol=1e-12)


def test_stokeslet_pressure_pair():
    """The Stokeslet satisfies -dP_k/dx_i + lap G_ik = 0 away from the pole;
    spot-check the momentum balance div sigma = 0 via FD on the stress."""
    p0 = np.array([0.7, -0.4, 1.1])
    h = 1e-5
    div = np.zeros((3, 3))
    for j in range(3):
        dp = np.zeros(3)
        dp[j] = h
        sp = np.asarray(stokeslet_stress(jnp.asarray((p0 + dp)[None, :])))[0]
        sm = np.asarray(stokeslet_stress(jnp.asarray((p0 - dp)[None, :])))[0]
        div += (sp[:, j, :] - sm[:, j, :]) / (2 * h)
    assert np.abs(div).max() < 1e-6


def test_green_d2n_recovery_with_helpers(reference_grid_dir):
    """The V_test_with_Green pipeline (reference `tests/V_test_with_Green.cc:
    68-204`) built on the helper functions: impose u = G(x-x0) e_1 from an
    interior source, run the dirichlet-to-neumann map, compare to the exact
    exterior traction trace."""
    from bemstokes_tpu.mesh import read_mesh
    from bemstokes_tpu.config import ProblemConfig, SolverConfig
    from bemstokes_tpu.problem import StokesBEMProblem
    from bemstokes_tpu.ops.resistance import dirichlet_to_neumann
    from bemstokes_tpu.ops.corrections import tangential_projector
    from bemstokes_tpu.fem.geometry import support_points
    from bemstokes_tpu.physics.rigid import flatten

    mesh = read_mesh(f"{reference_grid_dir}/sphere_translation_0.msh", dim=3)
    prob = StokesBEMProblem(
        mesh,
        ProblemConfig(
            grid_type="Real",
            force_pole="Origin",
            solver=SolverConfig(solve_directly=True),
        ),
    )
    euler = prob.initial_euler()
    _, _, ops, _ = prob._jit_pipeline(euler, jnp.zeros((3 * prob.n,)))
    pts = support_points(euler, prob.map_space, prob.fe_space)
    nv = ops["normal"]
    src = jnp.asarray([0.2, 0.0, 0.0])
    u = impose_G_as_velocity(pts, src, 0)
    t_exact = impose_G_as_trace(pts, nv["normal_pure"], src, 0)
    f = dirichlet_to_neumann(
        ops["V"], ops["K"], flatten(u),
        flatten(nv["normal_pure"]), flatten(nv["M_normal_pure"]),
        nv["l2_gamma_pure"],
    )
    te = tangential_projector(
        flatten(t_exact), flatten(nv["normal_pure"]),
        flatten(nv["M_normal_pure"]), nv["l2_gamma_pure"],
    )
    rel = float(jnp.linalg.norm(f - te) / jnp.linalg.norm(te))
    assert rel < 0.15, rel  # 9.8% observed on the coarse 96-cell sphere
