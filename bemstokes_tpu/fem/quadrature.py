"""Quadrature rules on the unit interval / unit square, including the singular
rules needed by collocation BEM.

The reference framework uses deal.II rules (see reference
`source/bem_stokes.cc:4912-4986`):

- smooth panels: tensor Gauss (ParsedQuadrature, order ~4-8 per direction);
- singular pairs, 3D, "Duffy": QSplit(QDuffy(order, 1), support_point) —
  the unit square is split into triangles sharing the support point as a
  vertex, and each triangle carries a Duffy-transformed Gauss rule whose
  Jacobian ~r cancels the 1/R kernel singularity;
- singular pairs, 3D, "Mixed" (default): QGaussOneOverR(order, sp,
  factor_out=true) for degree-1 elements — a 1/R-weighted rule with the
  singularity folded back into the weights — and plain iterated Gauss for
  degree >= 2;
- singular pairs, 3D, "Telles": tensor QTelles(order, sp) — a cubic change
  of variables with vanishing derivative at the singular point;
- singular pairs, 2D (line cells): QTelles for degree 1, iterated Gauss
  otherwise.

Here every rule is a host-side numpy table (points [q, d], weights [q]).  The
Duffy split rule is used for both "Duffy" and the degree-1 branch of "Mixed":
both treat the 1/R singularity by a Jacobian ~ r, and our accuracy tests bound
the quadrature error directly rather than diffing against deal.II point sets.

All rules live on the unit cell [0,1]^d.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# smooth rules
# ---------------------------------------------------------------------------


def gauss_1d(order: int) -> tuple[np.ndarray, np.ndarray]:
    """order-point Gauss-Legendre on [0,1]. Returns (points[q], weights[q])."""
    x, w = np.polynomial.legendre.leggauss(order)
    return 0.5 * (x + 1.0), 0.5 * w


def iterated_gauss_1d(order: int, copies: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss rule copied and scaled onto `copies` subintervals of [0,1]
    (deal.II QIterated(QGauss(order), copies))."""
    x, w = gauss_1d(order)
    pts, wts = [], []
    h = 1.0 / copies
    for k in range(copies):
        pts.append(k * h + h * x)
        wts.append(h * w)
    return np.concatenate(pts), np.concatenate(wts)


def _tensor2(x0, w0, x1, w1) -> tuple[np.ndarray, np.ndarray]:
    px, py = np.meshgrid(x0, x1, indexing="xy")
    wx, wy = np.meshgrid(w0, w1, indexing="xy")
    pts = np.stack([px.ravel(), py.ravel()], axis=-1)
    return pts, (wx * wy).ravel()


def gauss_quad(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Tensor Gauss on the unit square; points [q, 2], weights [q]."""
    x, w = gauss_1d(order)
    return _tensor2(x, w, x, w)


def iterated_gauss_quad(order: int, copies: int) -> tuple[np.ndarray, np.ndarray]:
    x, w = iterated_gauss_1d(order, copies)
    return _tensor2(x, w, x, w)


# ---------------------------------------------------------------------------
# Telles transformation
# ---------------------------------------------------------------------------


def telles_1d(order: int, x0: float) -> tuple[np.ndarray, np.ndarray]:
    """Telles cubic transformation of a Gauss rule on [0,1], clustering points
    at x0 in [0,1] with dx/dgamma = 0 there (Telles 1987).

    Maps [-1,1] -> [-1,1] via x(g) = ((g - gbar)^3 + gbar (gbar^2 + 3))
    / (1 + 3 gbar^2), with gbar the real solution of x(gbar) = s0.
    """
    s0 = 2.0 * x0 - 1.0  # singularity mapped to [-1,1]
    x, w = np.polynomial.legendre.leggauss(order)
    f = s0 * s0 - 1.0
    # real root via Cardano-style closed form (cbrt of possibly negative reals)
    gbar = np.cbrt(s0 * f + np.abs(f)) + np.cbrt(s0 * f - np.abs(f)) + s0
    denom = 1.0 + 3.0 * gbar * gbar
    xt = ((x - gbar) ** 3 + gbar * (gbar * gbar + 3.0)) / denom
    jac = 3.0 * (x - gbar) ** 2 / denom
    # back to [0,1]
    return 0.5 * (xt + 1.0), 0.5 * w * jac


def telles_quad(order: int, sp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Tensor product of 1D Telles rules aimed at support point sp [2]."""
    x0, w0 = telles_1d(order, float(sp[0]))
    x1, w1 = telles_1d(order, float(sp[1]))
    return _tensor2(x0, w0, x1, w1)


# ---------------------------------------------------------------------------
# Duffy split rules (vertex-singular triangle rules glued around the point)
# ---------------------------------------------------------------------------


def duffy_triangle_rule(order: int, beta: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Gauss rule on the reference triangle (0,0)-(1,0)-(0,1) whose weights
    vanish like r^(2 beta - 1) at the (0,0) vertex.

    Duffy map from the unit square: (u, v) -> (u^beta (1-v), u^beta v) with
    Jacobian beta u^(2 beta - 1).  For beta = 1 the Jacobian ~ r exactly
    cancels a 1/R kernel singularity at the vertex.
    """
    x, w = gauss_1d(order)
    u, v = np.meshgrid(x, x, indexing="xy")
    wu, wv = np.meshgrid(w, w, indexing="xy")
    ub = u**beta
    pts = np.stack([(ub * (1.0 - v)).ravel(), (ub * v).ravel()], axis=-1)
    jac = beta * u ** (2.0 * beta - 1.0)
    return pts, (wu * wv * jac).ravel()


def _map_triangle(pts, wts, v0, v1, v2):
    """Affine map of a reference-triangle rule to triangle (v0, v1, v2); the
    rule's singular vertex (0,0) lands on v0."""
    v0, v1, v2 = (np.asarray(v, dtype=np.float64) for v in (v0, v1, v2))
    e1, e2 = v1 - v0, v2 - v0
    jac = abs(e1[0] * e2[1] - e1[1] * e2[0])
    mapped = v0[None, :] + pts[:, :1] * e1[None, :] + pts[:, 1:2] * e2[None, :]
    return mapped, wts * jac


def singular_rule_quad(
    order: int, sp: np.ndarray, kind: str = "duffy", beta: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """Singular quadrature on the unit square with singularity at support
    point sp [2] (any location: vertex, edge or interior).

    kind == "duffy": split the square into the (up to 4) non-degenerate
    triangles (sp, c_k, c_{k+1}) over the square's corners in cyclic order and
    place a Duffy rule with its singular vertex at sp on each — the equivalent
    of deal.II QSplit(QDuffy(order, beta), sp), and the same Jacobian ~ r
    treatment as QGaussOneOverR(..., factor_out=true).

    kind == "telles": tensor Telles rule aimed at sp.
    """
    sp = np.asarray(sp, dtype=np.float64)
    if kind == "telles":
        return telles_quad(order, sp)
    if kind != "duffy":
        raise ValueError(f"unknown singular rule kind {kind!r}")
    corners = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    tri_pts, tri_wts = duffy_triangle_rule(order, beta)
    pts, wts = [], []
    for k in range(4):
        a, b = corners[k], corners[(k + 1) % 4]
        area2 = abs(
            (a[0] - sp[0]) * (b[1] - sp[1]) - (a[1] - sp[1]) * (b[0] - sp[0])
        )
        if area2 < 1e-14:
            continue  # sp lies on this edge: degenerate triangle
        p, w = _map_triangle(tri_pts, tri_wts, sp, a, b)
        pts.append(p)
        wts.append(w)
    return np.concatenate(pts), np.concatenate(wts)


def singular_rule_line(order: int, sp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Singular rule on [0,1] for 2D problems: Telles aimed at sp [1]
    (reference `source/bem_stokes.cc:4977-4981`)."""
    x, w = telles_1d(order, float(np.asarray(sp).ravel()[0]))
    return x[:, None], w
