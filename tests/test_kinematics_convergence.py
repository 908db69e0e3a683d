"""Time-integrator order verification — the reference's `rotation_test.cc` /
`rotation_test_cranck_nicholson.cc` analogs plus dt-halving studies.

Measured facts pinned here:
- fixed rotation axis: renormalized forward-Euler AND Crank-Nicolson are both
  2nd order in the revolution-closure error (renormalization makes the FE
  angle error O(dt^2) when the axis never moves), with CN 4x more accurate;
- time-varying rotation axis: FE degrades to 1st order while CN (with the
  natural midpoint omega evaluation) stays 2nd order and both converge to the
  same space-frame solution of R' = [omega]_x R — this is the regime the
  reference never tests, and where its sign-flipped A_CN block would diverge
  (see the note in `physics/kinematics.py:update_rotation_matrix`)."""

import numpy as np
import jax.numpy as jnp

from bemstokes_tpu.physics.kinematics import (
    rotation_matrix_2d,
    update_rotation_matrix,
)


def _closure_error(n_steps: int, forward_euler: bool) -> float:
    """Integrate one full revolution about ez in n steps; return ||R - I||."""
    omega = jnp.array([0.0, 0.0, 2.0 * np.pi])
    dt = 1.0 / n_steps
    R = jnp.eye(3)
    for _ in range(n_steps):
        R = update_rotation_matrix(R, omega, dt, forward_euler=forward_euler)
    return float(jnp.linalg.norm(R - jnp.eye(3)))


def _omega_wobble(t):
    """Time-varying axis: precession superposed on a 2*pi z-rotation."""
    return jnp.array([1.5 * np.sin(2.0 * np.pi * t), 0.0, 2.0 * np.pi])


def _integrate_wobble(n: int, forward_euler: bool) -> np.ndarray:
    dt = 1.0 / n
    R = jnp.eye(3)
    for k in range(n):
        t = k * dt
        if forward_euler:
            R = update_rotation_matrix(R, _omega_wobble(t), dt, True)
        else:
            R = update_rotation_matrix(
                R, _omega_wobble(t + 0.5 * dt), dt, False
            )
    return np.asarray(R)


def _exact_wobble() -> np.ndarray:
    """Space-frame reference solution of R' = [omega]_x R at t=1."""
    from scipy.integrate import solve_ivp

    def rhs(t, y):
        R = y.reshape(3, 3)
        w = np.array([1.5 * np.sin(2 * np.pi * t), 0.0, 2 * np.pi])
        Ox = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        )
        return (Ox @ R).ravel()

    sol = solve_ivp(rhs, (0.0, 1.0), np.eye(3).ravel(), rtol=1e-12, atol=1e-12)
    return sol.y[:, -1].reshape(3, 3)


def test_fixed_axis_closure_second_order_fe_and_cn():
    for fe in (True, False):
        e1, e2 = _closure_error(64, fe), _closure_error(128, fe)
        assert e1 > 1e-7
        assert 3.4 < e1 / e2 < 4.6, (fe, e1, e2)
    # CN is strictly tighter at equal dt (reference CN-variant motivation)
    assert _closure_error(128, False) < 0.3 * _closure_error(128, True)


def test_varying_axis_orders_fe1_cn2():
    Rex = _exact_wobble()
    e_fe = [np.linalg.norm(_integrate_wobble(n, True) - Rex) for n in (64, 128)]
    e_cn = [np.linalg.norm(_integrate_wobble(n, False) - Rex) for n in (64, 128)]
    assert 1.7 < e_fe[0] / e_fe[1] < 2.4, e_fe  # 1st order
    assert 3.4 < e_cn[0] / e_cn[1] < 4.6, e_cn  # 2nd order
    # both schemes integrate the same (space-frame) ODE
    assert e_fe[1] < 0.1 and e_cn[1] < 1e-3


def test_2d_rotation_exact_closure():
    """SO(2) update is exact: a revolution in any number of steps closes to
    round-off."""
    R = jnp.eye(2)
    n = 7
    for _ in range(n):
        R = update_rotation_matrix(R, 2.0 * np.pi / n, 1.0)
    assert float(jnp.linalg.norm(R - jnp.eye(2))) < 1e-12
    # quarter turn sends ex -> ey (counterclockwise convention)
    q = rotation_matrix_2d(np.pi / 2.0) @ jnp.array([1.0, 0.0])
    assert np.allclose(np.asarray(q), [0.0, 1.0], atol=1e-15)
