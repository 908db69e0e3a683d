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
  xi    [1, 3, T]              collocation points (SoA, lanes = rows)
  y     [1, vmax, 3, CJ*nq]    column quadrature points (SoA, lanes = samples)
  nrm   [1, vmax, 3, CJ*nq]    unit normals at those points
  w     [1, vmax, 1, CJ*nq]    phi_l * JxW weights (0 on padding)
  out   [1, 1, 9, CJ, T] x 2   V and K blocks, component-major

The vmax incidence groups are accumulated with an unrolled loop so the
working planes stay [CJ*nq, T] (512 kB at CJ=64, nq=16, T=128, f32).

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
    """Pure-VPU pairwise sweep.  Two structural wins over the naive version:

    - G and W.n are SYMMETRIC 3x3 tensors (G_ab = gs R_a R_b + diag d_ab,
      Wn_ab = ws R_a R_b), so only the 6 upper-triangle components are
      computed; the mirrored slots share the value;
    - the q-contraction is a strided sublane reduction (sum over the nq axis
      of the [CJ, nq, T] view) with the per-sample weight folded into the
      shared scale planes beforehand — no MXU micro-dots with a 1-row lhs.
    """
    dt = xi_ref.dtype
    cG = jnp.asarray(1.0 / (8.0 * math.pi), dt)
    cW = jnp.asarray(-3.0 / (4.0 * math.pi), dt)
    xix = xi_ref[0, 0, :][None, :]  # [1, T]
    xiy = xi_ref[0, 1, :][None, :]
    xiz = xi_ref[0, 2, :][None, :]

    UT = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    pv = [None] * 6  # accumulated weighted V planes, upper triangle
    pk = [None] * 6
    pdiag = None

    def acc(old, new):
        return new if old is None else old + new

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
        nx = n_ref[0, v, 0, :][:, None]
        ny = n_ref[0, v, 1, :][:, None]
        nz = n_ref[0, v, 2, :][:, None]
        pn = Rx * nx + Ry * ny + Rz * nz
        w = w_ref[0, v, 0, :][:, None]  # sample weight (0 on padding)
        wiR = w * invR
        wgs = cG * (wiR * invR2)  # w * G dyadic scale
        wws = (cW * pn * invR2) * (wiR * invR2)  # w * Wn scale
        pdiag = acc(pdiag, cG * wiR)
        comps = (Rx, Ry, Rz)
        for i, (a, b) in enumerate(UT):
            dy = comps[a] * comps[b]
            pv[i] = acc(pv[i], wgs * dy)
            pk[i] = acc(pk[i], wws * dy)

    # single q-contraction per component AFTER the valence loop: a ones-lhs
    # dot (the [CJ*nq, T] -> [CJ, nq, T] view is only legal as a dot rhs;
    # a bare reshape+reduce fails Mosaic layout inference)
    ones = jnp.ones((CJ, 1, nq), dt)
    dn = (((2,), (1,)), ((0,), (0,)))

    def qsum(p):  # [CJ*nq, T] -> [CJ, T]
        return jax.lax.dot_general(
            ones, p.reshape(CJ, nq, T), dimension_numbers=dn,
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0, :]

    sdiag = qsum(pdiag)
    acc_v = [None] * 9
    acc_k = [None] * 9
    for i, (a, b) in enumerate(UT):
        vab = qsum(pv[i])
        if a == b:
            vab = vab + sdiag
        # minus sign on K: exterior problem (reference `:2941-2947`)
        kab = -qsum(pk[i])
        acc_v[3 * a + b] = acc_v[3 * b + a] = vab
        acc_k[3 * a + b] = acc_k[3 * b + a] = kab
    v_ref[...] = jnp.stack(acc_v, axis=0)  # [9, CJ, T]
    k_ref[...] = jnp.stack(acc_k, axis=0)


def _node_kernel_t(
    xi_ref, y_ref, n_ref, w_ref, s_ref, v_ref, k_ref, *, CJ, nq, vmax, T
):
    """Transposed-plane variant: working planes [T, CJ*nq] — collocation
    rows in SUBLANES, column samples in LANES.  The column tables (y, n, w)
    then broadcast along sublanes with no relayout (they arrive lane-major);
    only the 3 xi components need a lane->sublane relayout, once per program
    instead of 7 per valence step.  The q-contraction is one MXU matmul per
    component against a constant 0/1 selection matrix S[CJ*nq, CJ]
    (S[m, c] = [m // nq == c], passed in as an input — in-kernel iota//nq
    hits an infinite recursion in Mosaic's convert lowering), i.e. a
    well-shaped [T, CJ*nq] x [CJ*nq, CJ] GEMM instead of a 1-row batched
    dot.  Outputs are [9, T, CJ]."""
    dt = xi_ref.dtype
    cG = jnp.asarray(1.0 / (8.0 * math.pi), dt)
    cW = jnp.asarray(-3.0 / (4.0 * math.pi), dt)
    xix = xi_ref[0, 0, :][:, None]  # [T, 1]
    xiy = xi_ref[0, 1, :][:, None]
    xiz = xi_ref[0, 2, :][:, None]

    UT = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    pv = [None] * 6
    pk = [None] * 6
    pdiag = None

    def acc(old, new):
        return new if old is None else old + new

    for v in range(vmax):
        Rx = y_ref[0, v, 0, :][None, :] - xix  # [T, CJ*nq]
        Ry = y_ref[0, v, 1, :][None, :] - xiy
        Rz = y_ref[0, v, 2, :][None, :] - xiz
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0
        one = jnp.ones((), dt)
        Rx = jnp.where(zero, one, Rx)
        Ry = jnp.where(zero, one, Ry)
        Rz = jnp.where(zero, one, Rz)
        r2 = jnp.where(zero, jnp.asarray(3.0, dt), r2)
        invR = jax.lax.rsqrt(r2)
        invR2 = invR * invR
        nx = n_ref[0, v, 0, :][None, :]
        ny = n_ref[0, v, 1, :][None, :]
        nz = n_ref[0, v, 2, :][None, :]
        pn = Rx * nx + Ry * ny + Rz * nz
        w = w_ref[0, v, 0, :][None, :]
        wiR = w * invR
        wgs = cG * (wiR * invR2)
        wws = (cW * pn * invR2) * (wiR * invR2)
        pdiag = acc(pdiag, cG * wiR)
        comps = (Rx, Ry, Rz)
        for i, (a, b) in enumerate(UT):
            dy = comps[a] * comps[b]
            pv[i] = acc(pv[i], wgs * dy)
            pk[i] = acc(pk[i], wws * dy)

    S = s_ref[...]  # [CJ*nq, CJ]
    dn = (((1,), (0,)), ((), ()))

    def qsum(p):  # [T, CJ*nq] -> [T, CJ]
        return jax.lax.dot_general(
            p, S, dimension_numbers=dn, preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )

    sdiag = qsum(pdiag)
    acc_v = [None] * 9
    acc_k = [None] * 9
    for i, (a, b) in enumerate(UT):
        vab = qsum(pv[i])
        if a == b:
            vab = vab + sdiag
        # minus sign on K: exterior problem (reference `:2941-2947`)
        kab = -qsum(pk[i])
        acc_v[3 * a + b] = acc_v[3 * b + a] = vab
        acc_k[3 * a + b] = acc_k[3 * b + a] = kab
    v_ref[...] = jnp.stack(acc_v, axis=0)  # [9, T, CJ]
    k_ref[...] = jnp.stack(acc_k, axis=0)


@partial(
    jax.jit, static_argnames=("CJ", "nq", "vmax", "T", "interpret", "transposed")
)
def pallas_node_blocks(
    xi,  # [n_tiles*T, 3] padded collocation points
    Y,  # [ncj, vmax, 3, CJ*nq]
    Nrm,  # [ncj, vmax, 3, CJ*nq]
    W,  # [ncj, vmax, 1, CJ*nq]
    *,
    CJ: int,
    nq: int,
    vmax: int,
    T: int,
    interpret: bool = False,
    transposed: bool = False,
):
    """Run the pairwise sweep over all (row tile, column chunk) programs.

    Each program writes its 9 dim-pair planes straight into the final
    component-major array — no [n_tiles, ncj, ...] block tensor to
    re-transpose through HBM afterwards (that intermediate doubled peak
    memory and OOM'd the 6k-node bench shape).  Returns (V, K) of shape
    [9, n_tiles*T, ncj*CJ] (`transposed=True`, rows in sublanes — the
    default layout used by `_assemble_rows_node`) or [9, ncj*CJ, n_tiles*T]
    (rows in lanes, `_node_kernel`)."""
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
    kern = _node_kernel_t if transposed else _node_kernel
    if transposed:
        out_ik = lambda i, k: (0 * i, i, k)
        out_block = (9, T, CJ)
        out_shape = (9, n_tiles * T, ncj * CJ)
    else:
        out_ik = lambda i, k: (0 * i, k, i)
        out_block = (9, CJ, T)
        out_shape = (9, ncj * CJ, n_tiles * T)
    in_specs = [
        pl.BlockSpec((1, 3, T), tile_i, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vmax, 3, CJ * nq), chunk_k, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vmax, 3, CJ * nq), chunk_k, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vmax, 1, CJ * nq), chunk_k, memory_space=pltpu.VMEM),
    ]
    inputs = [xi_tiles, Y, Nrm, W]
    if transposed:
        # constant q-group selection matrix for the in-kernel GEMM reduction
        S = (
            jnp.arange(CJ * nq, dtype=jnp.int32)[:, None] // nq
            == jnp.arange(CJ, dtype=jnp.int32)[None, :]
        ).astype(dt)
        in_specs.append(
            pl.BlockSpec(
                (CJ * nq, CJ), lambda i, k: (0 * i, 0 * i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(S)
    V, K = pl.pallas_call(
        partial(kern, CJ=CJ, nq=nq, vmax=vmax, T=T),
        grid=(n_tiles, ncj),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(out_block, out_ik, memory_space=pltpu.VMEM),
            pl.BlockSpec(out_block, out_ik, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, dt),
            jax.ShapeDtypeStruct(out_shape, dt),
        ],
        # 13 deferred accumulator planes + temporaries overflow the default
        # 16 MB scoped-vmem budget; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return V, K
