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

All three 3D Green's functions are fused here: free-space (both layouts),
and the free-surface / Blake no-slip image systems (transposed layout,
`_node_kernel_t` with kernel="free_surface"/"no_slip") — dim == 3 only; 2D
runs keep the XLA path.  Reference inner loop: `source/bem_stokes.cc:2915-2949`;
image systems `source/free_surface_kernel.cc`, `source/no_slip_wall_kernel.cc`.
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
    # cG = 1/8pi is FOLDED into the weight table by pallas_node_blocks for
    # this (free-space rows_lane) kernel; cW/cG = -6 carries the stresslet
    # scale (2 fewer VPU plane-ops per interaction than the explicit form)
    cWoG = jnp.asarray(-6.0, dt)
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
        w = w_ref[0, v, 0, :][:, None]  # cG * phi * JxW (0 on padding)
        wiR = w * invR
        wgs = wiR * invR2  # w * G dyadic scale (cG pre-folded)
        wws = (cWoG * pn * invR2) * wgs  # w * Wn scale
        pdiag = acc(pdiag, wiR)
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
    xi_ref,
    y_ref,
    n_ref,
    w_ref,
    s_ref,
    v_ref,
    k_ref,
    *,
    CJ,
    nq,
    vmax,
    T,
    kernel="free_space",
    wall_axis=1,
    wall_position=0.0,
    reduce="gemm",
    parts="both",
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
    dot.  Outputs are [9, T, CJ].

    `kernel` selects the Green's function at trace time:
    - "free_space": Stokeslet/stresslet (6 symmetric planes + diag);
    - "free_surface": + mirror image with the wall-normal ROW sign flip
      (reference `source/free_surface_kernel.cc`, kernels/images.py);
    - "no_slip": + the Blake image system (mirror Stokeslet + h0-weighted
      Stokes-doublet/source-doublet corrections, reference
      `source/no_slip_wall_kernel.cc:23-199`) — the full wall-bounded hot
      loop fused in VMEM.
    Image quantities follow kernels/images.py exactly (the oracle the
    interpret-mode tests compare against), including the dummy-offset
    convention on exact R == 0 pairs so the singular delta cancels."""
    dt = xi_ref.dtype
    cG = jnp.asarray(1.0 / (8.0 * math.pi), dt)
    cW = jnp.asarray(-3.0 / (4.0 * math.pi), dt)
    xi_c = [
        xi_ref[0, 0, :][:, None],
        xi_ref[0, 1, :][:, None],
        xi_ref[0, 2, :][:, None],
    ]  # [T, 1] each
    w_ax = wall_axis
    image = kernel != "free_space"
    if image:
        # image collocation point: only the wall component differs
        xiw_img = 2.0 * jnp.asarray(wall_position, dt) - xi_c[w_ax]
        # collocation height above the wall (per row): h0 = xi_w - pos
        h0 = xi_c[w_ax] - jnp.asarray(wall_position, dt)

    UT = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    ORD = tuple((a, b) for a in range(3) for b in range(3))
    acc_d = {}  # accumulated plane per key: [T, CJ*nq] (or [T, CJ] per-v)

    def red_qmajor(p):
        # q-major lanes (m = q*CJ + c): the q-contraction is nq-1 contiguous
        # [T, CJ] lane-slice adds — no MXU GEMM, no S matrix
        out = p[:, 0:CJ]
        for qi in range(1, nq):
            out = out + p[:, qi * CJ : (qi + 1) * CJ]
        return out

    if reduce == "qmajor_per_v":
        # reduce each valence contribution immediately: accumulator RMW
        # drops from [T, CJ*nq] to [T, CJ] planes (16x less VMEM traffic)
        def acc(key, new):
            r = red_qmajor(new)
            acc_d[key] = r if key not in acc_d else acc_d[key] + r

    else:

        def acc(key, new):
            acc_d[key] = new if key not in acc_d else acc_d[key] + new

    for v in range(vmax):
        Y = [y_ref[0, v, c, :][None, :] for c in range(3)]  # [1, CJ*nq]
        R = [Y[c] - xi_c[c] for c in range(3)]  # [T, CJ*nq]
        r2 = R[0] * R[0] + R[1] * R[1] + R[2] * R[2]
        zero = r2 == 0
        one = jnp.ones((), dt)
        R = [jnp.where(zero, one, Rc) for Rc in R]
        r2 = jnp.where(zero, jnp.asarray(3.0, dt), r2)
        invR = jax.lax.rsqrt(r2)
        invR2 = invR * invR
        N = [n_ref[0, v, c, :][None, :] for c in range(3)]
        w = w_ref[0, v, 0, :][None, :]  # sample weight (0 on padding)
        wiR = w * invR
        if parts == "sweep_only":
            # subtraction-profile floor: table loads + R/r2/rsqrt + ONE
            # accumulator plane, no dyadic/kernel work (diag_pallas_profile)
            acc("vd", cG * wiR)
            continue
        if parts in ("both", "k_only"):
            pn = R[0] * N[0] + R[1] * N[1] + R[2] * N[2]
            wws = (cW * pn * invR2) * (wiR * invR2)
        if parts in ("both", "v_only"):
            wgs = cG * (wiR * invR2)
            acc("vd", cG * wiR)
        for i, (a, b) in enumerate(UT):
            dy = R[a] * R[b]
            if parts in ("both", "v_only"):
                acc(("v", i), wgs * dy)
            if parts in ("both", "k_only"):
                acc(("k", i), wws * dy)

        if image:
            RI = list(R)
            RI[w_ax] = Y[w_ax] - xiw_img
            RI[w_ax] = jnp.where(zero, one, RI[w_ax])
            rI2 = RI[0] * RI[0] + RI[1] * RI[1] + RI[2] * RI[2]
            rI2 = jnp.where(zero, jnp.asarray(3.0, dt), rI2)
            invRI = jax.lax.rsqrt(rI2)
            invRI2 = invRI * invRI
            pnI = RI[0] * N[0] + RI[1] * N[1] + RI[2] * N[2]
            wiRI = w * invRI
            wgsI = cG * (wiRI * invRI2)
            if kernel == "free_surface":
                wwsI = (cW * pnI * invRI2) * (wiRI * invRI2)
                acc("vdI", cG * wiRI)
                for i, (a, b) in enumerate(UT):
                    dyI = RI[a] * RI[b]
                    acc(("vI", i), wgsI * dyI)
                    acc(("kI", i), wwsI * dyI)
            else:  # no_slip (Blake)
                invRI3 = invRI * invRI2
                invRI5 = invRI3 * invRI2
                # h0 is per-row but the dummy pairs must contribute ZERO
                # correction (the delta recompute gets h0 = 0 there)
                h0p = jnp.where(zero, jnp.zeros((), dt), h0 + 0.0 * r2)
                RIw = RI[w_ax]
                beta = 2.0 * h0p * (RIw - h0p)  # -2h0^2 + 2h0 RI_w
                # --- G image terms (no_slip_wall_G, scaled by cG = 1/8pi) --
                # mirror Stokeslet: -G0(RI)
                acc("vdI", cG * wiRI)
                for i, (a, b) in enumerate(UT):
                    acc(("vI", i), wgsI * RI[a] * RI[b])
                # t_a * [beta * D_ab + 2 h0 SD_ab], D = -3 RI RI /RI^5
                #  + delta/RI^3, SD_ab = (d_aw RI_b - d_bw RI_a)/RI^3
                wbD = cG * w * beta * invRI5
                for i, (a, b) in enumerate(UT):
                    acc(("vD", i), wbD * RI[a] * RI[b])
                acc("vDd", cG * w * beta * invRI3)
                wSD = cG * w * 2.0 * h0p * invRI3
                for b in range(3):
                    acc(("vSD", b), wSD * RI[b])
                # --- K image terms (no_slip_wall_Wn, scale cWn = 3/4pi,
                # assembled K gets an extra global minus like free space) --
                # base image: + RI_a RI_b pIn / RI^5
                wI5 = w * pnI * invRI5
                for i, (a, b) in enumerate(UT):
                    acc(("kI", i), wI5 * RI[a] * RI[b])
                # gamma = t'_a (2h0^2 - 2h0 RI_w) = -t'_a * beta
                # Tn_ab = -(n_a RI_b + d_ab RI_a^2 n_a)/RI^5
                #         + 5 RI_a RI_b pIn / RI^7
                wbI5 = w * beta * invRI5
                wbI7 = wbI5 * invRI2
                for i, (a, b) in enumerate(UT):
                    acc(("kT5", i), wbI7 * 5.0 * RI[a] * RI[b] * pnI)
                for a, b in ORD:
                    acc(("kTnab", (a, b)), wbI5 * N[a] * RI[b])
                for a in range(3):
                    acc(("kTd", a), wbI5 * RI[a] * RI[a] * N[a])
                # Un_ab = (n_b RI_a RI_w - d_aw RI_b pIn)/RI^5, weight 2h0
                wU = w * 2.0 * h0p * invRI5
                for a, b in ORD:
                    acc(("kUab", (a, b)), wU * N[b] * RI[a] * RIw)
                for b in range(3):
                    acc(("kUw", b), wU * RI[b] * pnI)

    if reduce == "qmajor_per_v":
        q = acc_d  # already [T, CJ]
    elif reduce == "qmajor":
        q = {k: red_qmajor(p) for k, p in acc_d.items()}
    else:
        S = s_ref[...]  # [CJ*nq, CJ]
        dn = (((1,), (0,)), ((), ()))

        def qsum(p):  # [T, CJ*nq] -> [T, CJ]
            return jax.lax.dot_general(
                p, S, dimension_numbers=dn, preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST,
            )

        q = {k: qsum(p) for k, p in acc_d.items()}
    if parts != "both":
        # subtraction-profile variants (free-space only): absent op groups
        # read as zeros so the output signature stays identical
        assert kernel == "free_space"
        _zq = jnp.zeros((T, CJ), dt)
        q = {
            key: q.get(key, _zq)
            for key in [("v", i) for i in range(6)]
            + [("k", i) for i in range(6)]
            + ["vd"]
        }
    sgn = [(-1.0 if a == w_ax else 1.0) for a in range(3)]  # row sign s_a
    cWn = jnp.asarray(3.0 / (4.0 * math.pi), dt)
    acc_v = [None] * 9
    acc_k = [None] * 9
    for i, (a, b) in enumerate(UT) if kernel != "no_slip" else ():
        vab = q[("v", i)]
        kab = q[("k", i)]
        if a == b:
            vab = vab + q["vd"]
        if kernel == "free_space":
            acc_v[3 * a + b] = acc_v[3 * b + a] = vab
            acc_k[3 * a + b] = acc_k[3 * b + a] = -kab
            continue
        if kernel == "free_surface":
            vI = q[("vI", i)] + (q["vdI"] if a == b else 0.0)
            kI = q[("kI", i)]
            acc_v[3 * a + b] = vab + sgn[a] * vI
            acc_v[3 * b + a] = vab + sgn[b] * vI
            acc_k[3 * a + b] = -(kab + sgn[a] * kI)
            acc_k[3 * b + a] = -(kab + sgn[b] * kI)
    if kernel == "no_slip":
        for a, b in ORD:
            i_ut = UT.index((a, b) if a <= b else (b, a))
            vab = q[("v", i_ut)] + (q["vd"] if a == b else 0.0)
            # t_a = +1 on the wall row, -1 elsewhere (G corr);
            # t'_a = -1 on the wall row, +1 elsewhere (Wn corr) = sgn[a]
            t_a = 1.0 if a == w_ax else -1.0
            vI = q[("vI", i_ut)] + (q["vdI"] if a == b else 0.0)
            corr = -3.0 * q[("vD", i_ut)]
            if a == b:
                corr = corr + q["vDd"]
            if a == w_ax:
                corr = corr + q[("vSD", b)]
            if b == w_ax:
                corr = corr - q[("vSD", a)]
            acc_v[3 * a + b] = vab - vI + t_a * corr
            # Wn: base(p) is the free-space accumulation (cW scale), image
            # and corrections carry the explicit cWn = 3/4pi scale
            kab = q[("k", i_ut)]
            kimg = cWn * q[("kI", i_ut)]
            Tn = cWn * (
                q[("kT5", i_ut)]
                - q[("kTnab", (a, b))]
                - (q[("kTd", a)] if a == b else 0.0)
            )
            Un = cWn * (
                q[("kUab", (a, b))] - (q[("kUw", b)] if a == w_ax else 0.0)
            )
            # Wn_img = kimg + sgn[a] * (-beta*Tn_terms... ) — the beta/2h0
            # weights are already folded into the planes: the accumulated
            # kT*/kU* carry (2h0^2 - 2h0 RI_w) = -beta and 2h0 resp. via
            # sign conventions handled here
            acc_k[3 * a + b] = -(kab + kimg + sgn[a] * (-Tn - Un))
    if v_ref is None:
        # planes_out: 18 separate [T, CJ] refs (9 V then 9 K) in k_ref —
        # each dim-pair plane lands directly at its final (a*nr+r, b*n+c)
        # strip, so the dense assembly is a pure 3x3 concat instead of a
        # [9, R, C] -> interleaved relayout (measured 30 ms of the 178 ms
        # 6k-node assembly)
        for j in range(9):
            k_ref[j][...] = acc_v[j]
            k_ref[9 + j][...] = acc_k[j]
        return
    v_ref[...] = jnp.stack(acc_v, axis=0)  # [9, T, CJ]
    k_ref[...] = jnp.stack(acc_k, axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "CJ",
        "nq",
        "vmax",
        "T",
        "interpret",
        "transposed",
        "kernel",
        "wall_axis",
        "wall_position",
        "reduce",
        "parts",
        "planes_out",
    ),
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
    kernel: str = "free_space",
    wall_axis: int = 1,
    wall_position: float = 0.0,
    reduce: str = "gemm",
    parts: str = "both",
    planes_out: bool = False,
):
    """Run the pairwise sweep over all (row tile, column chunk) programs.

    `planes_out` (transposed only): return (V_planes, K_planes) — two
    lists of nine [n_tiles*T, ncj*CJ] dim-pair planes in row-major (a, b)
    order — instead of stacked [9, R, C] arrays, so callers assemble the
    dense operator with a pure 3x3 concat (jnp.block) rather than an
    interleaving relayout.

    `parts` ("both" | "v_only" | "k_only" | "sweep_only", free-space
    transposed only) strips op groups for the subtraction profile
    (scripts/diag_pallas_profile.py) — NOT a production mode.

    `reduce` selects the q-contraction (transposed layout only): "gemm" =
    the 0/1 S-matrix MXU GEMM over lane-major samples (m = c*nq + q);
    "qmajor" / "qmajor_per_v" = contiguous lane-slice adds over q-major
    samples (m = q*CJ + c; the caller must build the tables with
    `node_sweep_soa(..., q_major=True)`), reducing at the end or per
    valence step respectively — no MXU reduction and (per_v) 16x less
    accumulator VMEM traffic.

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
    if reduce != "gemm":
        assert transposed, "qmajor reductions are transposed-layout only"
    if kernel != "free_space":
        assert transposed, "image kernels are implemented in the transposed layout"
        kern = partial(
            _node_kernel_t,
            kernel=kernel,
            wall_axis=wall_axis,
            wall_position=wall_position,
            reduce=reduce,
        )
    else:
        kern = (
            partial(_node_kernel_t, reduce=reduce, parts=parts)
            if transposed
            else _node_kernel
        )
        assert parts == "both" or transposed, (
            "subtraction-profile parts need the transposed kernel"
        )
        if not transposed:
            # rows_lane free-space kernel expects cG pre-folded into the
            # weight table (see _node_kernel)
            W = W * jnp.asarray(1.0 / (8.0 * math.pi), dt)
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
        if reduce == "gemm":
            # constant q-group selection matrix for the in-kernel GEMM
            # reduction (qmajor modes reduce by lane-slice adds instead)
            S = (
                jnp.arange(CJ * nq, dtype=jnp.int32)[:, None] // nq
                == jnp.arange(CJ, dtype=jnp.int32)[None, :]
            ).astype(dt)
        else:
            # dummy S slot (unused by the qmajor reductions; keeps the
            # kernel signature uniform at negligible VMEM cost)
            S = jnp.zeros((8, 128), dt)
        in_specs.append(
            pl.BlockSpec(
                S.shape, lambda i, k: (0 * i, 0 * i),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(S)
    if planes_out:
        assert transposed, "planes_out needs the transposed layout"
        base = partial(kern, CJ=CJ, nq=nq, vmax=vmax, T=T)

        def kfn(xi_r, y_r, n_r, w_r, s_r, *outs):
            base(xi_r, y_r, n_r, w_r, s_r, None, list(outs))

        plane_spec = pl.BlockSpec(
            (T, CJ), lambda i, k: (i, k), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            kfn,
            grid=(n_tiles, ncj),
            in_specs=in_specs,
            out_specs=[plane_spec] * 18,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * T, ncj * CJ), dt)
            ]
            * 18,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        return list(outs[:9]), list(outs[9:])
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
