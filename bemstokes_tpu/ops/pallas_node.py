"""Fused Pallas TPU kernel for the column-centric ("node") assembly pass.

The node formulation (ops.assemble._assemble_rows_node) turns collocation
assembly into a pure pairwise interaction sweep: per column node j, a fixed
per-frame table of m = vmax*nq quadrature samples (point, unit normal,
JxW-weighted shape value); V/K entries are weighted sums of the Stokeslet /
normal-contracted stresslet over those samples.  No gather or scatter in the
hot loop — which is exactly what lets THIS kernel keep every intermediate
(R, r^-1, kernel planes) in VMEM and feed the m-contraction straight to the
MXU, instead of round-tripping slot tensors through HBM like the gather-mode
XLA pipeline does (the measured bottleneck: order-2 and order-4 quadrature
ran at the same speed under XLA).

Grid: (row tiles, column chunks).  Per program:
  xi    [3, T]                 collocation points (SoA, lanes = rows)
  y     [1, vmax, 3, CJ*nq]    column quadrature points (SoA, lanes = q)
  nrm   [1, vmax, 3, CJ*nq]    unit normals at those points
  w     [1, vmax, CJ, nq]      phi_l * JxW weights (0 on padding)
  out   [1, 9, CJ, T] x 2      V and K blocks, component-major

The vmax incidence groups are accumulated with an unrolled loop so the
working planes stay [CJ*nq, T] (~1 MB at CJ=128, nq=16, T=128).

Exact R == 0 pairs (a collocation node sitting on one of its own cells'
quadrature points) get the same dummy-offset convention as the XLA node
path, so the singular delta correction cancels them.

Free-space kernel only (dim == 3) — the O(N^2) bulk of every 3D run; image
variants keep the XLA path.  Reference inner loop:
`source/bem_stokes.cc:2915-2949`.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _node_kernel(xi_ref, y_ref, n_ref, w_ref, v_ref, k_ref, *, CJ, nq, vmax, T):
    dt = xi_ref.dtype
    cG = jnp.asarray(1.0 / (8.0 * math.pi), dt)
    cW = jnp.asarray(-3.0 / (4.0 * math.pi), dt)
    xix = xi_ref[0, 0, :][None, :]  # [1, T]
    xiy = xi_ref[0, 1, :][None, :]
    xiz = xi_ref[0, 2, :][None, :]

    # batched [CJ, 1, nq] x [CJ, nq, T] -> [CJ, 1, T]: Mosaic's dot lowering
    # requires a non-empty lhs non-contracting dim, hence the singleton row
    dn = (((2,), (1,)), ((0,), (0,)))

    acc_v = [jnp.zeros((CJ, T), dt) for _ in range(9)]
    acc_k = [jnp.zeros((CJ, T), dt) for _ in range(9)]
    for v in range(vmax):
        Rx = y_ref[0, v, 0, :][:, None] - xix  # [CJ*nq, T]
        Ry = y_ref[0, v, 1, :][:, None] - xiy
        Rz = y_ref[0, v, 2, :][:, None] - xiz
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0
        one = jnp.ones((), dt)
        Rx = jnp.where(zero, one, Rx)
        Ry = jnp.where(zero, one, Ry)
        Rz = jnp.where(zero, one, Rz)
        r2 = jnp.where(zero, jnp.asarray(3.0, dt), r2)
        invR = jax.lax.rsqrt(r2)
        invR2 = invR * invR
        invR3 = invR * invR2
        nx = n_ref[0, v, 0, :][:, None]
        ny = n_ref[0, v, 1, :][:, None]
        nz = n_ref[0, v, 2, :][:, None]
        pn = Rx * nx + Ry * ny + Rz * nz
        gs = cG * invR3
        ws = cW * pn * invR2 * invR3
        diag = cG * invR
        wv = w_ref[0, v].reshape(CJ, 1, nq)
        comps = (Rx, Ry, Rz)
        for a in range(3):
            for b in range(3):
                dy = comps[a] * comps[b]
                G_ab = gs * dy + (diag if a == b else jnp.zeros_like(diag))
                Wn_ab = ws * dy
                acc_v[3 * a + b] += jax.lax.dot_general(
                    wv,
                    G_ab.reshape(CJ, nq, T),
                    dimension_numbers=dn,
                    preferred_element_type=dt,
                )[:, 0, :]
                # minus sign on K: exterior problem (reference `:2941-2947`)
                acc_k[3 * a + b] -= jax.lax.dot_general(
                    wv,
                    Wn_ab.reshape(CJ, nq, T),
                    dimension_numbers=dn,
                    preferred_element_type=dt,
                )[:, 0, :]
    v_ref[0, 0] = jnp.stack(acc_v, axis=0)  # [9, CJ, T]
    k_ref[0, 0] = jnp.stack(acc_k, axis=0)


@partial(
    jax.jit, static_argnames=("CJ", "nq", "vmax", "T", "interpret")
)
def pallas_node_blocks(
    xi,  # [n_tiles*T, 3] padded collocation points
    Y,  # [ncj, vmax, 3, CJ*nq]
    Nrm,  # [ncj, vmax, 3, CJ*nq]
    W,  # [ncj, vmax, CJ, nq]
    *,
    CJ: int,
    nq: int,
    vmax: int,
    T: int,
    interpret: bool = False,
):
    """Run the pairwise sweep over all (row tile, column chunk) programs.
    Returns (V, K) of shape [n_tiles, ncj, 9, CJ, T]."""
    n_tiles = xi.shape[0] // T
    ncj = Y.shape[0]
    dt = xi.dtype
    # [n_tiles, 3, T]: index maps must return a homogeneous int tuple —
    # python-int literals next to a traced program id lower as i64 next to
    # i32, which Mosaic refuses to legalize ("failed to legalize func.return")
    # — so derive every zero from a program id (0*i stays i32)
    xi_tiles = xi.reshape(n_tiles, T, 3).transpose(0, 2, 1)
    tile_i = lambda i, k: (i, 0 * i, 0 * i)
    chunk_k = lambda i, k: (k, 0 * k, 0 * k, 0 * k)
    out_ik = lambda i, k: (i, k, 0 * i, 0 * i, 0 * i)
    V, K = pl.pallas_call(
        partial(_node_kernel, CJ=CJ, nq=nq, vmax=vmax, T=T),
        grid=(n_tiles, ncj),
        in_specs=[
            pl.BlockSpec((1, 3, T), tile_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vmax, 3, CJ * nq), chunk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vmax, 3, CJ * nq), chunk_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vmax, CJ, nq), chunk_k, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 9, CJ, T), out_ik, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, CJ, T), out_ik, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, ncj, 9, CJ, T), dt),
            jax.ShapeDtypeStruct((n_tiles, ncj, 9, CJ, T), dt),
        ],
        interpret=interpret,
    )(xi_tiles, Y, Nrm, W)
    return V, K
