"""Kernel derivatives by automatic differentiation.

The reference carries a Sacado-AD duplicate of every kernel
(`SacadoKernel<rank,dim>::sacado_value/2`, `gradient_tens`,
`source/kernel.cc:87-187`) to get Green's-function gradients for stress
recovery and (experimental) hypersingular work.  In JAX the primal kernels in
`kernels.stokeslet` / `kernels.images` are already differentiable, so the AD
family is a set of `jacfwd` wrappers — no duplicated kernel code.

Conventions: gradients are with respect to the separation vector p = x - y;
output index order is value indices first, derivative index last
(`grad_G[..., i, j, k] = d G_ij / d p_k`), matching the reference's
`gradient_tens` layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stokeslet import stokeslet_G, stresslet_W


def _jac(fn):
    """Batched forward-mode Jacobian over the trailing [dim] vector axis."""

    def wrapped(p: jnp.ndarray, *args, **kwargs):
        single = jax.jacfwd(lambda q: fn(q, *args, **kwargs))
        flat = p.reshape(-1, p.shape[-1])
        out = jax.vmap(single)(flat)
        return out.reshape(p.shape[:-1] + out.shape[1:])

    return wrapped


grad_stokeslet_G = _jac(stokeslet_G)
"""d G_ij / d p_k -> [..., dim, dim, dim] (reference gradient_tens of the
rank-2 Sacado kernel)."""

grad_stresslet_W = _jac(stresslet_W)
"""d W_ijk / d p_l -> [..., dim, dim, dim, dim]."""


def stokeslet_pressure(p: jnp.ndarray) -> jnp.ndarray:
    """Pressure vector of the Stokeslet, P_j = p_j / (4 pi R^3) (3D) — the
    companion field needed to assemble the Stokeslet's Cauchy stress."""
    dim = p.shape[-1]
    R = jnp.sqrt(jnp.sum(p * p, axis=-1))
    if dim == 2:
        return p / (2.0 * jnp.pi * (R**2)[..., None])
    return p / (4.0 * jnp.pi * (R**3)[..., None])


def stokeslet_stress(p: jnp.ndarray) -> jnp.ndarray:
    """Cauchy stress tensor of the Stokeslet column fields,
    sigma_ijk = -delta_ij P_k + (dG_ik/dp_j + dG_jk/dp_i)  (mu = 1):
    index k is the Stokeslet direction. Verified against the stresslet
    identity sigma_ijk = W_kij = -3 p_i p_j p_k / (4 pi R^5) in 3D."""
    dim = p.shape[-1]
    gG = grad_stokeslet_G(p)  # [..., i, k, j] = dG_ik/dp_j
    P = stokeslet_pressure(p)
    eye = jnp.eye(dim, dtype=p.dtype)
    sym = jnp.swapaxes(gG, -1, -2)  # [..., i, j, k] = dG_ik/dp_j
    sig = sym + jnp.swapaxes(sym, -3, -2)  # + dG_jk/dp_i
    return sig - eye[..., :, :, None] * P[..., None, None, :]
