"""Quadrature tests, mirroring the reference's categories:
- exactness of smooth Gauss rules,
- singular rules integrating x^i y^j / R over the unit square against exact
  values (reference `tests/integrate_one_over_r_Q2.cc`)."""

import numpy as np
import pytest

from bemstokes_tpu.fem import (
    gauss_1d,
    gauss_quad,
    telles_1d,
    duffy_triangle_rule,
    singular_rule_quad,
    singular_rule_line,
)
from bemstokes_tpu.fem.reference_element import LagrangeQuad, LagrangeLine


def exact_integral_one_over_r(i, j, x0, y0):
    """Exact integral of x^i y^j / sqrt((x-x0)^2 + (y-y0)^2) over [0,1]^2 by
    adaptive numerical integration (scipy-free: high-order tensor Gauss on a
    graded tiling around the singularity)."""
    # graded tiling: dyadic squares shrinking toward (x0, y0)
    val = 0.0
    xg, wg = np.polynomial.legendre.leggauss(30)
    xg = 0.5 * (xg + 1.0)
    wg = 0.5 * wg

    def patch(ax, bx, ay, by):
        px = ax + (bx - ax) * xg
        py = ay + (by - ay) * xg
        X, Y = np.meshgrid(px, py, indexing="ij")
        WX, WY = np.meshgrid(wg * (bx - ax), wg * (by - ay), indexing="ij")
        R = np.sqrt((X - x0) ** 2 + (Y - y0) ** 2)
        return np.sum(WX * WY * X**i * Y**j / R)

    # split [0,1]^2 into rings around the singular point
    levels = 40
    # bounding boxes shrinking geometrically toward the point
    boxes = []
    cur = [(0.0, 1.0, 0.0, 1.0)]
    sx0, sy0 = x0, y0
    r = 1.0
    prev = (0.0, 1.0, 0.0, 1.0)
    for k in range(1, levels + 1):
        r = 0.5**k
        ax, bx = max(0.0, sx0 - r), min(1.0, sx0 + r)
        ay, by = max(0.0, sy0 - r), min(1.0, sy0 + r)
        boxes.append(((ax, bx, ay, by), prev))
        prev = (ax, bx, ay, by)
    # integrate outer minus inner via inclusion-exclusion on rings
    for (inner, outer) in boxes:
        ax, bx, ay, by = outer
        iax, ibx, iay, iby = inner
        # ring = outer box minus inner box; decompose into 4 rectangles
        rects = [
            (ax, bx, ay, iay),
            (ax, bx, iby, by),
            (ax, iax, iay, iby),
            (ibx, bx, iay, iby),
        ]
        for (rax, rbx, ray, rby) in rects:
            if rbx - rax > 1e-300 and rby - ray > 1e-300:
                val += patch(rax, rbx, ray, rby)
    # innermost box: singular but tiny; duffy there
    ax, bx, ay, by = prev
    if bx - ax > 0 and by - ay > 0:
        pts, wts = singular_rule_quad(
            20, [(sx0 - ax) / (bx - ax), (sy0 - ay) / (by - ay)]
        )
        X = ax + (bx - ax) * pts[:, 0]
        Y = ay + (by - ay) * pts[:, 1]
        R = np.sqrt((X - x0) ** 2 + (Y - y0) ** 2)
        val += np.sum(wts * (bx - ax) * (by - ay) * X**i * Y**j / R)
    return val


def test_gauss_1d_exactness():
    for n in range(1, 8):
        x, w = gauss_1d(n)
        for p in range(2 * n):
            exact = 1.0 / (p + 1)
            assert abs(np.sum(w * x**p) - exact) < 1e-14


def test_gauss_quad_exactness():
    pts, wts = gauss_quad(4)
    assert abs(np.sum(wts) - 1.0) < 1e-14
    val = np.sum(wts * pts[:, 0] ** 3 * pts[:, 1] ** 5)
    assert abs(val - (1 / 4) * (1 / 6)) < 1e-14


def test_telles_total_weight():
    for x0 in [0.0, 0.3, 1.0]:
        x, w = telles_1d(12, x0)
        assert abs(np.sum(w) - 1.0) < 1e-12
        assert np.all(x >= -1e-12) and np.all(x <= 1 + 1e-12)


def test_telles_log_singularity():
    # integral of log|x - 0| over [0,1] = -1
    x, w = telles_1d(20, 0.0)
    assert abs(np.sum(w * np.log(np.abs(x))) - (-1.0)) < 1e-6


def test_duffy_triangle_area():
    pts, wts = duffy_triangle_rule(6)
    assert abs(np.sum(wts) - 0.5) < 1e-14
    assert np.all(pts >= -1e-14)
    assert np.all(pts.sum(1) <= 1 + 1e-12)


@pytest.mark.parametrize("sp", [(0.0, 0.0), (1.0, 0.0), (0.5, 0.5), (0.5, 0.0)])
def test_singular_rule_weight_and_domain(sp):
    pts, wts = singular_rule_quad(8, np.array(sp))
    assert abs(np.sum(wts) - 1.0) < 1e-12
    assert np.all(pts >= -1e-12) and np.all(pts <= 1 + 1e-12)


@pytest.mark.parametrize("sp", [(0.0, 0.0), (1.0, 1.0), (0.5, 0.5)])
@pytest.mark.parametrize("ij", [(0, 0), (1, 0), (1, 1), (2, 1)])
def test_integrate_one_over_r(sp, ij):
    """Duffy-split rule vs exact integral of x^i y^j / R (the reference's
    integrate_one_over_r test, `tests/integrate_one_over_r_Q2.cc`)."""
    i, j = ij
    x0, y0 = sp
    pts, wts = singular_rule_quad(16, np.array(sp))
    R = np.sqrt((pts[:, 0] - x0) ** 2 + (pts[:, 1] - y0) ** 2)
    R = np.where(R == 0, 1.0, R)
    approx = np.sum(wts * pts[:, 0] ** i * pts[:, 1] ** j / R)
    exact = exact_integral_one_over_r(i, j, x0, y0)
    assert abs(approx - exact) < 5e-7, (approx, exact)


def test_lagrange_partition_of_unity():
    for deg in (1, 2, 3):
        el = LagrangeQuad(deg)
        pts = np.random.RandomState(0).rand(17, 2)
        v = el.shape_values(pts)
        assert np.allclose(v.sum(-1), 1.0, atol=1e-13)
        g = el.shape_grads(pts)
        assert np.allclose(g.sum(-2), 0.0, atol=1e-12)
        # Kronecker property at support points
        vs = el.shape_values(el.support_points)
        assert np.allclose(vs, np.eye(el.n_nodes), atol=1e-13)


def test_lagrange_line():
    el = LagrangeLine(2)
    vs = el.shape_values(el.support_points)
    assert np.allclose(vs, np.eye(3), atol=1e-13)


def test_integrate_one_over_r_all_q2_points_order_sweep():
    """The reference sweeps ALL Q2 support points and orders 3..19
    (`tests/integrate_one_over_r_Q2.cc:7-30`): the singular rule must
    converge in the order at every support point, including edge midpoints
    and the cell center, and reach tight accuracy at high order."""
    q2_points = [
        (x, y) for x in (0.0, 0.5, 1.0) for y in (0.0, 0.5, 1.0)
    ]
    for sp in q2_points:
        x0, y0 = sp
        errs = []
        for order in (4, 8, 16):
            pts, wts = singular_rule_quad(order, np.array(sp))
            R = np.sqrt((pts[:, 0] - x0) ** 2 + (pts[:, 1] - y0) ** 2)
            R = np.where(R == 0, 1.0, R)
            err = 0.0
            for i, j in ((0, 0), (1, 0), (1, 1), (2, 1)):
                approx = np.sum(wts * pts[:, 0] ** i * pts[:, 1] ** j / R)
                err = max(
                    err, abs(approx - exact_integral_one_over_r(i, j, x0, y0))
                )
            errs.append(err)
        assert errs[2] < 5e-6, (sp, errs)
        assert errs[2] <= errs[0] * 1.01, (sp, errs)  # converging in order
