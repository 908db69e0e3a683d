"""Green's-function test helpers (reference `include/helper_functions.h:21-74`,
duplicated at `source/bem_stokes.cc:33-79`): impose a Stokeslet column as a
boundary velocity field, or its exact traction trace, at the support points.
Used by the fundamental-solution convergence tests (`V_test_with_Green` family).
"""

from __future__ import annotations

import jax.numpy as jnp

from .stokeslet import stokeslet_G
from .autodiff import stokeslet_stress


def impose_G_as_velocity(
    support_pts: jnp.ndarray, source: jnp.ndarray, component: int = 0
) -> jnp.ndarray:
    """u(x) = G(x - x0) . e_c at each support point -> [n, dim]."""
    R = support_pts - jnp.asarray(source, support_pts.dtype)[None, :]
    return stokeslet_G(R)[..., component]


def impose_G_as_trace(
    support_pts: jnp.ndarray,
    normals: jnp.ndarray,
    source: jnp.ndarray,
    component: int = 0,
) -> jnp.ndarray:
    """Exact Cauchy traction trace of the Stokeslet column e_c at each
    support point, with the EXTERIOR-problem sign convention: the reference's
    impose_G_as_trace_1 contracts the stresslet with the NEGATED body normal
    (`include/helper_functions.h:57-58`), i.e. t = sigma . (-n) — this is the
    trace the dirichlet-to-neumann map of the exterior BIE recovers."""
    R = support_pts - jnp.asarray(source, support_pts.dtype)[None, :]
    sig = stokeslet_stress(R)[..., component]  # [n, i, j]
    return -jnp.einsum("nij,nj->ni", sig, normals)
