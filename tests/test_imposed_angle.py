"""`angle_for_imposed_stuff` parity (reference `source/bem_stokes.cc:
3277-3294`): for ImposedForce/ImposedVelocity runs the imposed unit vector is
rotated about the x-axis by the configured angle — but ONLY when dim == 3 and
`extra_debug_info` is true (the reference gates the rotation inside the
debug branch; we preserve the quirk)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bemstokes_tpu.config import ProblemConfig, SolverConfig
from bemstokes_tpu.mesh.factories import create_sphere
from bemstokes_tpu.problem import StokesBEMProblem
from bemstokes_tpu.physics.rigid import flatten


def _solve(component, angle=0.0, debug=False):
    cfg = ProblemConfig(
        grid_type="ImposedVelocity",
        imposed_component=component,
        angle_for_imposed_stuff=angle,
        extra_debug_info=debug,
        force_pole="Origin",
        body_manifold="sphere",
        solver=SolverConfig(solve_directly=True),
    )
    mesh = create_sphere(refinements=2)
    prob = StokesBEMProblem(mesh, cfg)
    res = prob.solve_frame(prob.initial_euler(), jnp.zeros((3 * prob.n,)))
    import jax

    N_dual_flat = jax.vmap(flatten)(res["operators"]["N_dual"])
    return np.asarray(N_dual_flat @ res["stokes_forces"])


def test_quarter_turn_moves_imposed_axis():
    """Rx(pi/2) e_y = e_z: the rotated run must match the component-2 run."""
    F_rot = _solve(component=1, angle=np.pi / 2.0, debug=True)
    F_z = _solve(component=2)
    assert np.allclose(F_rot, F_z, atol=1e-10), (F_rot, F_z)
    # and differ from the unrotated component-1 run in the expected way
    F_y = _solve(component=1)
    assert F_y[1] == pytest.approx(F_z[2], rel=1e-10)
    assert abs(F_rot[1]) < 1e-8 * abs(F_rot[2])


def test_rotation_gated_on_extra_debug_info():
    """Parity quirk: without extra_debug_info the angle is ignored."""
    F_plain = _solve(component=1)
    F_angled = _solve(component=1, angle=np.pi / 2.0, debug=False)
    assert np.allclose(F_plain, F_angled, atol=1e-12)


def test_generic_angle_rotates_force():
    """At 30 degrees about x the drag of the (symmetric) sphere follows the
    rotated direction: F ~ |F| (0, cos a, sin a)."""
    a = np.pi / 6.0
    F = _solve(component=1, angle=a, debug=True)
    mag = np.linalg.norm(F[:3])
    assert mag > 1.0
    assert F[1] == pytest.approx(mag * np.cos(a), rel=1e-6)
    assert F[2] == pytest.approx(mag * np.sin(a), rel=1e-6)
