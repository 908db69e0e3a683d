"""Hand-fused Pallas TPU kernel for the smooth collocation-assembly hot loop.

Replaces the XLA-fused `pair_blocks` tile body of `ops.assemble` (reference
inner loop `source/bem_stokes.cc:2915-2949`) with one explicitly scheduled
kernel per collocation row-tile:

  grid = (panel chunks,)
  per step:  evaluate the free-space Stokeslet G and the normal-contracted
             stresslet W.n for a [C*nq, T] tile of (quadrature point x
             collocation node) pairs in structure-of-arrays layout (lanes =
             the T collocation nodes of the tile, sublanes = chunk quadrature
             points), then contract over the nq quadrature points with the
             JxW-weighted shape values on the MXU, emitting the per-cell-slot
             column tensors consumed by the incidence gather-reduce of
             `ops.assemble`.

Numerics are identical to the JAX path (same masking and padding rules); the
win is locality: R, G, W.n never round-trip through HBM, and the q-contraction
runs immediately on data already in VMEM.

Only the (dim == 3, free-space kernel) configuration — the O(N^2) bulk of
every 3D run — is implemented here; image-kernel variants keep the XLA path
(`ops.assemble._eval_G_Wn`).

Measured on one v5e chip (6146 nodes x 6144 panels, f32, quad order 4):
1.18e8 panel-pairs/s at (row_tile=128, cell_chunk=64) vs 1.14e8 for the
XLA-fused default — XLA's automatic fusion is already near the achievable
envelope for this op, so "jax" stays the default backend; the kernel is kept
as the scheduling baseline and the starting point for a future variant that
fuses the incidence gather.  VMEM limits: cell_chunk 128 or row_tile 256
exceed the 16 MB budget (the [C*nl*9, T] output blocks dominate).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xi_ref, xq_ref, nrm_ref, wphi_ref, keep_ref,
            v_ref, k_ref, *, C, nq, nl, T):
    """One panel chunk vs one collocation tile.

    xi_ref:   [3, T]         collocation points (SoA)
    xq_ref:   [1, 3, C*nq]   chunk quadrature points (SoA)
    nrm_ref:  [1, 3, C*nq]   chunk unit normals (SoA)
    wphi_ref: [1, C, nl, nq] JxW-weighted FE shape values
    keep_ref: [1, C, T]      1.0 where the pair is smooth, 0.0 on singular
                             (own-cell) pairs, which a separate path handles
    v_ref:    [1, C * nl * 9, T] output V slot block
    k_ref:    [1, C * nl * 9, T] output K slot block
    """
    dt = xi_ref.dtype
    keep = keep_ref[0]  # [C, T]
    # broadcast to quadrature points: [C, T] -> [C*nq, T] (leading-dim merge)
    keepq = jnp.broadcast_to(keep[:, None, :], (C, nq, T)).reshape(C * nq, T)
    one = jnp.ones((), dt)

    # ---- R = x_q - x_i, SoA: three [C*nq, T] planes; masked pairs can hit
    # R == 0 exactly, so substitute a dummy finite offset there (their
    # contribution is zeroed by `keep` after the contraction) ----
    def rcomp(d):
        R = xq_ref[0, d, :][:, None] - xi_ref[d, :][None, :]
        return jnp.where(keepq > 0, R, one)

    Rx, Ry, Rz = rcomp(0), rcomp(1), rcomp(2)

    # ---- free-space Stokeslet & stresslet.n (kernels/stokeslet.py math) ----
    r2 = Rx * Rx + Ry * Ry + Rz * Rz
    invR = jax.lax.rsqrt(r2)
    invR2 = invR * invR
    invR3 = invR * invR2
    nx = nrm_ref[0, 0, :][:, None]
    ny = nrm_ref[0, 1, :][:, None]
    nz = nrm_ref[0, 2, :][:, None]
    pn = Rx * nx + Ry * ny + Rz * nz
    cG = jnp.asarray(1.0 / (8.0 * math.pi), dt)
    cW = jnp.asarray(-3.0 / (4.0 * math.pi), dt)
    gs = cG * invR3  # shared G scale for the dyadic part
    ws = cW * pn * invR2 * invR3
    diag = cG * invR

    comps = (Rx, Ry, Rz)
    wphi = wphi_ref[0]  # [C, nl, nq]
    dn = (((2,), (1,)), ((0,), (0,)))

    def contract(p):  # [C*nq, T] -> [C, nl, T] on the MXU
        return jax.lax.dot_general(
            wphi, p.reshape(C, nq, T), dimension_numbers=dn,
            preferred_element_type=dt,
        )

    keep_l = keep[:, None, :]  # [C, 1, T]
    Vs, Ks = [], []
    for a in range(3):
        for b in range(3):
            dy = comps[a] * comps[b]
            G_ab = gs * dy + (diag if a == b else jnp.zeros_like(diag))
            Wn_ab = ws * dy
            Vs.append(contract(G_ab) * keep_l)
            # minus sign on K: exterior problem (reference `:2941-2947`)
            Ks.append(-(contract(Wn_ab) * keep_l))
    # [C, nl, 9, T] -> flat slot-major block
    v_ref[0] = jnp.stack(Vs, axis=2).reshape(C * nl * 9, T)
    k_ref[0] = jnp.stack(Ks, axis=2).reshape(C * nl * 9, T)


@partial(jax.jit, static_argnames=("C", "nq", "nl", "interpret"))
def pallas_tile_slots(
    xi_t,  # [T, 3]
    xq,  # [NCc, C, nq, 3] chunked quadrature points
    nrm,  # [NCc, C, nq, 3]
    wphi,  # [NCc, C, nq, nl] JxW * phi_fe
    keep,  # [NCc, C, T] 1.0 on smooth pairs, 0.0 on singular pairs
    *,
    C: int,
    nq: int,
    nl: int,
    interpret: bool = False,
):
    """All panel chunks against one collocation tile.  Returns
    (V_slots, K_slots) of shape [NCc*C*nl, 9, T] matching the slot layout of
    `ops.assemble`'s gather-based column reduction."""
    NCc = xq.shape[0]
    T = xi_t.shape[0]
    dt = xi_t.dtype
    # SoA transposes (layout prep, fused into the surrounding jit)
    xi_soa = xi_t.T  # [3, T]
    xq_soa = xq.reshape(NCc, C * nq, 3).transpose(0, 2, 1)  # [NCc, 3, C*nq]
    nrm_soa = nrm.reshape(NCc, C * nq, 3).transpose(0, 2, 1)
    wphi_t = wphi.transpose(0, 1, 3, 2)  # [NCc, C, nl, nq]

    chunk = lambda i: (i, 0, 0)
    V, K = pl.pallas_call(
        partial(_kernel, C=C, nq=nq, nl=nl, T=T),
        grid=(NCc,),
        in_specs=[
            pl.BlockSpec((3, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C * nq), chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C * nq), chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, nl, nq), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, T), chunk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C * nl * 9, T), chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C * nl * 9, T), chunk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NCc, C * nl * 9, T), dt),
            jax.ShapeDtypeStruct((NCc, C * nl * 9, T), dt),
        ],
        interpret=interpret,
    )(xi_soa, xq_soa, nrm_soa, wphi_t, keep)
    return (
        V.reshape(NCc * C * nl, 9, T),
        K.reshape(NCc * C * nl, 9, T),
    )
