"""Split-precision f64 GEMV for TPU: hi/lo f32 MXU passes with f64 chunk
accumulation.

XLA's f64 emulation of `A @ v` on TPU materializes relayout/expansion
copies of the matrix (measured: a 35.8 GB compile for ONE 18,444-unknown
f64 pipeline — f32[8, n, n] + f32[4, n, n] allocations — vs the 2.7 GB
the f64 matrix itself needs), so any production-scale f64 iteration is
memory-impossible through the emulated dot.  This module replaces those
dots with the TPU-native formulation:

    A = A_hi + A_lo   (f32 split: A_hi = f32(A), A_lo = f32(A - A_hi))
    v = v_hi + v_lo
    A @ v ~= sum_c [ A_hi[:, c] @ [v_hi, v_lo][c]  +  A_lo[:, c] @ v_hi[c] ]

with the column range chunked and the per-chunk f32 partials accumulated
in f64.  Measured on a v5e at n = 8192 against the bit-true emulated-f64
GEMV: relative error 1.0e-7 (chunk 512; 6.9e-8 at 128) vs 1.5e-7 for the
plain f32 GEMV, at plain-f32 SPEED (24.9 vs 24.8 ms incl relay RPC; the
emulated f64 dot takes 66.7 ms) and 2 f32 matrices of memory instead of
the emulation's 8x-n^2 copies.  The MXU dots MUST run at
Precision.HIGHEST: at default precision the products' bf16 truncation
floors the error at 1.3e-5 (measured), defeating the split.

Used by the monolithic solve path above
`SolverConfig.split_f64_gemv_threshold` unknowns (problem.py); the small
validation configs keep the bit-true emulated f64 path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def split_f64(M: jnp.ndarray, chunk: int = 512):
    """Split an f64 matrix into (M_hi, M_lo) f32 with columns padded to a
    multiple of `chunk` (zeros; padding columns multiply padded zeros of
    the vector)."""
    n, m = M.shape
    pad = (-m) % chunk
    Mh = M.astype(jnp.float32)
    Ml = (M - Mh.astype(jnp.float64)).astype(jnp.float32)
    if pad:
        Mh = jnp.pad(Mh, ((0, 0), (0, pad)))
        Ml = jnp.pad(Ml, ((0, 0), (0, pad)))
    return Mh, Ml


@partial(jax.jit, static_argnames=("chunk",))
def split_gemv(M_hi: jnp.ndarray, M_lo: jnp.ndarray, v: jnp.ndarray, chunk: int = 512):
    """y (f64) = (M_hi + M_lo) @ v with f64 chunk accumulation.  M_hi/M_lo
    are the `split_f64` outputs [n, mp]; v is f64 [m] with m <= mp."""
    n, mp = M_hi.shape
    nC = mp // chunk
    v64 = v.astype(jnp.float64)
    vp = jnp.zeros((mp,), jnp.float64).at[: v.shape[0]].set(v64)
    vh = vp.astype(jnp.float32)
    vl = (vp - vh.astype(jnp.float64)).astype(jnp.float32)
    Mh3 = M_hi.reshape(n, nC, chunk)
    Ml3 = M_lo.reshape(n, nC, chunk)
    rhs = jnp.stack([vh.reshape(nC, chunk), vl.reshape(nC, chunk)], axis=-1)
    # batched over chunks: [n, c, k] x [c, k, 2] -> [c, n, 2]
    dn = (((2,), (1,)), ((1,), (0,)))
    hi_terms = jax.lax.dot_general(
        Mh3,
        rhs,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [c, n, 2]
    lo_term = jax.lax.dot_general(
        Ml3,
        rhs[..., :1],
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [c, n, 1]
    parts = jnp.concatenate([hi_terms, lo_term], axis=-1).astype(jnp.float64)
    return parts.sum(axis=(0, 2))


def make_split_gemv(M: jnp.ndarray, chunk: int = 512):
    """Convenience: split once, return the matvec callable."""
    Mh, Ml = split_f64(M, chunk)

    def mv(v):
        return split_gemv(Mh, Ml, v, chunk=chunk)

    return mv
