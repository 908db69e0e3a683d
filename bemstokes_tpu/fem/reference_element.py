"""Reference Lagrange elements on the unit line / unit square.

The reference framework builds its FE spaces from deal.II `FESystem[FE_Q(d)^dim]`
(vector Lagrange elements on codim-1 quadrilateral cells; see
reference `include/bem_stokes.h:418` and the `.prm` "Finite Element Stokes"
subsection).  Here the element is just a set of numpy tables: support points in
the unit cell, and shape values / gradients evaluated at arbitrary reference
points.  Everything downstream (mapping, assembly) consumes these tables as
dense arrays, so the element never appears inside jitted code — only its
tabulated values do.

Local node ordering is *lexicographic tensor-product* ordering: node
(i, j) of a degree-d quad sits at ((i/d, j/d)) with flat index j*(d+1)+i.
This differs from deal.II's hierarchic (vertices/lines/interior) ordering on
purpose — lexicographic order keeps the tables trivially vectorizable.  Mesh
readers are responsible for translating connectivity into this ordering.

Degree 0 is the discontinuous midpoint element (deal.II FE_DGQ(0)).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np


def _lagrange_1d_tables(degree: int, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Values and derivatives of the 1D equidistant Lagrange basis at points x.

    Returns (values[..., degree+1], derivs[..., degree+1]).
    """
    x = np.asarray(x, dtype=np.float64)
    if degree == 0:
        shp = x.shape + (1,)
        return np.ones(shp), np.zeros(shp)
    nodes = np.linspace(0.0, 1.0, degree + 1)
    n = degree + 1
    vals = np.empty(x.shape + (n,))
    ders = np.empty(x.shape + (n,))
    for k in range(n):
        others = np.delete(nodes, k)
        denom = np.prod(nodes[k] - others)
        # value: prod_j (x - x_j) / denom
        diffs = x[..., None] - others  # [..., n-1]
        vals[..., k] = np.prod(diffs, axis=-1) / denom
        # derivative: sum_m prod_{j != m} (x - x_j) / denom
        der = np.zeros_like(x)
        for m in range(n - 1):
            der += np.prod(np.delete(diffs, m, axis=-1), axis=-1)
        ders[..., k] = der / denom
    return vals, ders


@dataclasses.dataclass(frozen=True)
class LagrangeLine:
    """Scalar Lagrange element on the unit interval (codim-1 cell of a 2D problem)."""

    degree: int

    @property
    def n_nodes(self) -> int:
        return max(self.degree, 0) + 1 if self.degree > 0 else 1

    @property
    def support_points(self) -> np.ndarray:  # [n_nodes, 1]
        if self.degree == 0:
            return np.array([[0.5]])
        return np.linspace(0.0, 1.0, self.degree + 1)[:, None]

    def shape_values(self, pts: np.ndarray) -> np.ndarray:
        """pts [..., 1] -> [..., n_nodes]."""
        pts = np.asarray(pts, dtype=np.float64)
        v, _ = _lagrange_1d_tables(self.degree, pts[..., 0])
        return v

    def shape_grads(self, pts: np.ndarray) -> np.ndarray:
        """pts [..., 1] -> [..., n_nodes, 1]."""
        pts = np.asarray(pts, dtype=np.float64)
        _, d = _lagrange_1d_tables(self.degree, pts[..., 0])
        return d[..., None]


@dataclasses.dataclass(frozen=True)
class LagrangeQuad:
    """Scalar Lagrange element on the unit square (codim-1 cell of a 3D problem).

    Lexicographic node ordering: flat index j*(degree+1)+i for node (i, j).
    """

    degree: int

    @property
    def n_nodes_1d(self) -> int:
        return self.degree + 1 if self.degree > 0 else 1

    @property
    def n_nodes(self) -> int:
        return self.n_nodes_1d**2

    @property
    def support_points(self) -> np.ndarray:  # [n_nodes, 2]
        if self.degree == 0:
            return np.array([[0.5, 0.5]])
        g = np.linspace(0.0, 1.0, self.degree + 1)
        xx, yy = np.meshgrid(g, g, indexing="xy")  # y outer, x inner
        return np.stack([xx.ravel(), yy.ravel()], axis=-1)

    def shape_values(self, pts: np.ndarray) -> np.ndarray:
        """pts [..., 2] -> [..., n_nodes] (lexicographic: y-major)."""
        pts = np.asarray(pts, dtype=np.float64)
        vx, _ = _lagrange_1d_tables(self.degree, pts[..., 0])
        vy, _ = _lagrange_1d_tables(self.degree, pts[..., 1])
        # node (i, j) -> vy[j] * vx[i]; flatten with j outer
        vals = vy[..., :, None] * vx[..., None, :]  # [..., ny, nx]
        return vals.reshape(pts.shape[:-1] + (self.n_nodes,))

    def shape_grads(self, pts: np.ndarray) -> np.ndarray:
        """pts [..., 2] -> [..., n_nodes, 2]."""
        pts = np.asarray(pts, dtype=np.float64)
        vx, dx = _lagrange_1d_tables(self.degree, pts[..., 0])
        vy, dy = _lagrange_1d_tables(self.degree, pts[..., 1])
        gx = vy[..., :, None] * dx[..., None, :]
        gy = dy[..., :, None] * vx[..., None, :]
        g = np.stack([gx, gy], axis=-1)  # [..., ny, nx, 2]
        return g.reshape(pts.shape[:-1] + (self.n_nodes, 2))


@lru_cache(maxsize=None)
def reference_element(cell_dim: int, degree: int):
    """Element factory: cell_dim is the reference-cell dimension (1 for 2D
    problems, 2 for 3D problems)."""
    if cell_dim == 1:
        return LagrangeLine(degree)
    if cell_dim == 2:
        return LagrangeQuad(degree)
    raise ValueError(f"unsupported reference cell dimension {cell_dim}")
