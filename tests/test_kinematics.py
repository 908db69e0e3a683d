"""Quaternion rotation-update tests (reference `tests/rotation_test.cc`
and `rotation_test_cranck_nicholson.cc`: full oscillatory revolution returns
to the start within 1e-5; orthogonality preserved)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bemstokes_tpu.physics.kinematics import (
    rotation_matrix_from_quaternion,
    quaternion_from_rotation_matrix,
    update_rotation_matrix,
    rigid_pointwise_velocities,
    integrate_displacements,
)


def test_quaternion_roundtrip():
    rng = np.random.RandomState(0)
    v = rng.randn(4)
    q = jnp.asarray(v / np.linalg.norm(v))
    q = jnp.where(q[0] < 0, -q, q)  # w > 0 branch of the inverse
    Rm = rotation_matrix_from_quaternion(q)
    q2 = quaternion_from_rotation_matrix(Rm)
    assert np.allclose(np.asarray(q2), np.asarray(q), atol=1e-12)
    assert np.allclose(np.asarray(Rm.T @ Rm), np.eye(3), atol=1e-12)


@pytest.mark.parametrize("forward_euler", [True, False])
def test_oscillatory_revolution_closure(forward_euler):
    """Integrate omega(t) = 2 pi cos(2 pi t) e_z over t in [0, 1] (net
    rotation angle returns through 0); the rotation of e_x must track
    rotation by angle sin(2 pi t) (reference rotation_test)."""
    n_steps = 20000 if forward_euler else 4000
    dt = 1.0 / n_steps

    def step(Rm, j):
        omega = jnp.array(
            [0.0, 0.0, jnp.cos(2 * jnp.pi * j / n_steps) * 2 * jnp.pi]
        )
        Rm = update_rotation_matrix(Rm, omega, dt, forward_euler=forward_euler)
        return Rm, None

    Rm, _ = jax.lax.scan(step, jnp.eye(3), jnp.arange(n_steps))
    # after the full period the net angle is sin(2 pi) = 0
    assert np.allclose(np.asarray(Rm), np.eye(3), atol=1e-4)
    # orthogonality
    assert np.allclose(np.asarray(Rm.T @ Rm), np.eye(3), atol=1e-10)


def test_halfway_angle():
    """At t = 1/4 the accumulated angle is sin(pi/2) = 1 rad."""
    n_steps = 20000
    dt = 1.0 / n_steps

    def step(Rm, j):
        omega = jnp.array(
            [0.0, 0.0, jnp.cos(2 * jnp.pi * j / n_steps) * 2 * jnp.pi]
        )
        return update_rotation_matrix(Rm, omega, dt), None

    Rm, _ = jax.lax.scan(step, jnp.eye(3), jnp.arange(n_steps // 4))
    p = np.asarray(Rm @ jnp.array([1.0, 0.0, 0.0]))
    expect = np.array([np.cos(1.0), np.sin(1.0), 0.0])
    assert np.allclose(p, expect, atol=5e-4), (p, expect)  # forward-Euler O(dt) at dt=5e-5


def test_rigid_pointwise_velocities_and_displacements():
    n = 5
    N = jnp.asarray(np.random.RandomState(1).randn(6, n, 3))
    U = jnp.asarray(np.random.RandomState(2).randn(6))
    v_full, v_tr = rigid_pointwise_velocities(U, N, 3, assemble_scaling=2.0)
    ref_full = 2.0 * np.einsum("r,rnd->nd", np.asarray(U), np.asarray(N))
    ref_tr = 2.0 * np.einsum(
        "r,rnd->nd", np.asarray(U[:3]), np.asarray(N[:3])
    )
    assert np.allclose(np.asarray(v_full), ref_full)
    assert np.allclose(np.asarray(v_tr), ref_tr)
    disp = integrate_displacements(
        jnp.zeros((n, 3)), v_tr, 0.1, (True, False, True)
    )
    assert np.allclose(np.asarray(disp)[:, 1], 0.0)
    assert np.allclose(np.asarray(disp)[:, 0], 0.1 * ref_tr[:, 0])


def test_numpy_twin_matches_jax():
    """update_rotation_matrix_np (the swimmer's host-side per-frame update)
    must track the jax update_rotation_matrix exactly — 3D quaternion
    forward-Euler and the exact 2D SO(2) increment."""
    import numpy as np
    import jax.numpy as jnp

    from bemstokes_tpu.physics.kinematics import (
        update_rotation_matrix,
        update_rotation_matrix_np,
    )

    rng = np.random.default_rng(11)
    Rm = np.eye(3)
    for _ in range(5):
        omega = rng.standard_normal(3)
        R_jax = np.asarray(
            update_rotation_matrix(
                jnp.asarray(Rm), jnp.asarray(omega), 0.013, forward_euler=True
            )
        )
        R_np = update_rotation_matrix_np(Rm, omega, 0.013)
        assert np.abs(R_jax - R_np).max() < 1e-14
        Rm = R_np

    R2 = np.eye(2)
    R2_jax = np.asarray(
        update_rotation_matrix(jnp.asarray(R2), jnp.asarray(0.3), 0.1)
    )
    R2_np = update_rotation_matrix_np(R2, 0.3, 0.1)
    assert np.abs(R2_jax - R2_np).max() < 1e-15
