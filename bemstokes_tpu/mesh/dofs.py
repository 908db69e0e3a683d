"""Scalar-space node numbering (the array-first replacement for deal.II's
DoFHandler + component-wise renumbering, reference `source/bem_stokes.cc:
1593-1594`).

A vector space never exists as an object: the framework stores fields either
as [n_nodes, dim] arrays or component-blocked flat vectors of length
dim*n_nodes with flat index i + c*n_nodes — the same layout the reference
adopts ("component c of node i lives at global index i + c*N/dim").

For a continuous Lagrange space of degree d on quads, global scalar nodes are
vertices + (d-1) nodes per edge + (d-1)^2 interior nodes per cell.  Degree 0
is discontinuous: one node per cell.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fem.reference_element import reference_element
from .surface_mesh import SurfaceMesh


@dataclasses.dataclass
class ScalarSpace:
    """Numbering of the scalar nodes of a degree-d Lagrange space."""

    mesh: SurfaceMesh
    degree: int
    n_nodes: int
    cells_nodes: np.ndarray  # [Nc, nl] global scalar node ids, lex local order
    unit_support_points: np.ndarray  # [nl, cell_dim]

    @property
    def cell_dim(self) -> int:
        return self.mesh.dim - 1

    @property
    def nl(self) -> int:
        return self.cells_nodes.shape[1]

    def node_positions(self, vertices: np.ndarray | None = None) -> np.ndarray:
        """Geometric node positions [n_nodes, dim] from (possibly deformed)
        vertex positions, averaging contributions of adjacent cells (exact for
        polynomial geometry of the same degree)."""
        if vertices is None:
            vertices = self.mesh.vertices
        elem = reference_element(self.cell_dim, 1)
        phi = elem.shape_values(self.unit_support_points)  # [nl, nv_cell]
        cell_pos = np.einsum(
            "lv,cvd->cld", phi, vertices[self.mesh.cells]
        )  # [Nc, nl, dim]
        pos = np.zeros((self.n_nodes, vertices.shape[1]))
        count = np.zeros((self.n_nodes, 1))
        np.add.at(pos, self.cells_nodes.ravel(), cell_pos.reshape(-1, vertices.shape[1]))
        np.add.at(count, self.cells_nodes.ravel(), 1.0)
        return pos / count


def subcell_connectivity(space: ScalarSpace):
    """Degree-correct output cells: split every degree-p cell into p^cdim
    sub-quads (or sub-lines) over the space's own scalar nodes — the analog
    of deal.II DataOut's `n_subdivisions` so degree >= 2 fields are rendered
    on their actual support points (reference `output_save_stokes_results`
    emits curved patches, `source/bem_stokes.cc:5164-5262`).

    Returns (cells [Nc*p^cdim, 4 or 2] scalar-node ids, parent [Nc*p^cdim]
    parent-cell index for replicating cell data)."""
    p = space.degree
    if p < 1:
        raise ValueError("subcell output needs a continuous space (degree>=1)")
    cn = space.cells_nodes
    Nc = cn.shape[0]
    if space.cell_dim == 2:
        n1 = p + 1
        sub = np.asarray(
            [
                [j * n1 + i, j * n1 + i + 1, (j + 1) * n1 + i, (j + 1) * n1 + i + 1]
                for j in range(p)
                for i in range(p)
            ]
        )  # [p*p, 4] lexicographic corners
    else:
        sub = np.asarray([[i, i + 1] for i in range(p)])
    cells = cn[:, sub].reshape(-1, sub.shape[1])
    parent = np.repeat(np.arange(Nc), len(sub))
    return cells, parent


def _build_quad_space(mesh: SurfaceMesh, degree: int) -> ScalarSpace:
    d = degree
    n1 = d + 1
    elem = reference_element(2, d)
    Nc = mesh.n_cells
    cells_nodes = np.full((Nc, n1 * n1), -1, dtype=np.int64)

    def lex(i, j):
        return j * n1 + i

    # vertices: local lex corners (0,0)=(0), (1,0)=(1), (0,1)=(2), (1,1)=(3)
    corner_local = [lex(0, 0), lex(d, 0), lex(0, d), lex(d, d)]
    for k, cl in enumerate(corner_local):
        cells_nodes[:, cl] = mesh.cells[:, k]
    next_id = mesh.n_vertices

    if d >= 2:
        # edges: (va, vb) with va < vb; nodes stored from va to vb
        edge_nodes: dict[tuple[int, int], np.ndarray] = {}
        # local edges as (cornerA_localvertex, cornerB_localvertex, [locals along])
        edges_def = [
            (0, 1, [lex(i, 0) for i in range(1, d)]),  # bottom
            (2, 3, [lex(i, d) for i in range(1, d)]),  # top
            (0, 2, [lex(0, j) for j in range(1, d)]),  # left
            (1, 3, [lex(d, j) for j in range(1, d)]),  # right
        ]
        for c in range(Nc):
            verts = mesh.cells[c]
            for va_l, vb_l, locals_along in edges_def:
                va, vb = int(verts[va_l]), int(verts[vb_l])
                key = (min(va, vb), max(va, vb))
                if key not in edge_nodes:
                    ids = np.arange(next_id, next_id + d - 1)
                    next_id += d - 1
                    edge_nodes[key] = ids
                ids = edge_nodes[key]
                if va <= vb:
                    cells_nodes[c, locals_along] = ids
                else:
                    cells_nodes[c, locals_along] = ids[::-1]
        # interior nodes
        interior_locals = [lex(i, j) for j in range(1, d) for i in range(1, d)]
        for c in range(Nc):
            ids = np.arange(next_id, next_id + (d - 1) ** 2)
            next_id += (d - 1) ** 2
            cells_nodes[c, interior_locals] = ids

    return ScalarSpace(mesh, d, next_id, cells_nodes, elem.support_points)


def _build_line_space(mesh: SurfaceMesh, degree: int) -> ScalarSpace:
    d = degree
    elem = reference_element(1, d)
    Nc = mesh.n_cells
    cells_nodes = np.full((Nc, d + 1), -1, dtype=np.int64)
    cells_nodes[:, 0] = mesh.cells[:, 0]
    cells_nodes[:, d] = mesh.cells[:, 1]
    next_id = mesh.n_vertices
    if d >= 2:
        for c in range(Nc):
            ids = np.arange(next_id, next_id + d - 1)
            next_id += d - 1
            cells_nodes[c, 1:d] = ids
    return ScalarSpace(mesh, d, next_id, cells_nodes, elem.support_points)


def _build_dg0_space(mesh: SurfaceMesh) -> ScalarSpace:
    elem = reference_element(mesh.dim - 1, 0)
    Nc = mesh.n_cells
    cells_nodes = np.arange(Nc, dtype=np.int64)[:, None]
    return ScalarSpace(mesh, 0, Nc, cells_nodes, elem.support_points)


def build_scalar_space(mesh: SurfaceMesh, degree: int) -> ScalarSpace:
    if degree == 0:
        return _build_dg0_space(mesh)
    if mesh.dim == 3:
        return _build_quad_space(mesh, degree)
    if mesh.dim == 2:
        return _build_line_space(mesh, degree)
    raise ValueError(f"unsupported ambient dimension {mesh.dim}")
