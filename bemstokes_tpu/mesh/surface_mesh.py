"""Codim-1 surface meshes as plain numpy arrays.

The reference stores geometry in a deal.II `Triangulation<dim-1, dim>` with
per-cell material ids encoding boundary-condition type (reference
`source/bem_stokes.cc:1202-1322`): 0 = swimmer body, 2 = no-slip wall,
3 = free-surface wall, 4 = do-nothing wall, 5 = dirichlet wall,
6 = neumann wall.  We keep the same material-id convention.

Cells store vertex indices in *lexicographic* local order: for quads,
(0,0), (1,0), (0,1), (1,1) — i.e. a counterclockwise quad (a, b, c, d)
is stored as (a, b, d, c).  Line cells (2D problems) are (start, end).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MATERIAL_BODY = 0
MATERIAL_WALL_NO_SLIP = 2
MATERIAL_WALL_FREE_SURFACE = 3
MATERIAL_WALL_DO_NOTHING = 4
MATERIAL_WALL_DIRICHLET = 5
MATERIAL_WALL_NEUMANN = 6

WALL_TYPE_TO_MATERIAL = {
    "no_slip": MATERIAL_WALL_NO_SLIP,
    "free_surface": MATERIAL_WALL_FREE_SURFACE,
    "do_nothing": MATERIAL_WALL_DO_NOTHING,
    "dirichlet": MATERIAL_WALL_DIRICHLET,
    "neumann": MATERIAL_WALL_NEUMANN,
}


@dataclasses.dataclass
class SurfaceMesh:
    """A codim-1 mesh embedded in `dim`-dimensional space.

    vertices: [Nv, dim] float64
    cells:    [Nc, 2 or 4] int32, lexicographic local ordering
    material_id: [Nc] int32
    flip_normal: [Nc] bool — cells whose parametric normal must be reversed
        (wall factories use this to aim wall normals into the fluid).
    edge_midpoints: [M, 3] int32 rows (mid, a, b) — exact parent-edge records
        written by `refine.refine_uniform`; the hanging-node constraint
        builder consumes these instead of a geometric heuristic.  None on
        meshes that never went through the refiner.
    """

    vertices: np.ndarray
    cells: np.ndarray
    material_id: np.ndarray
    flip_normal: np.ndarray | None = None
    edge_midpoints: np.ndarray | None = None

    def __post_init__(self):
        self.vertices = np.asarray(self.vertices, dtype=np.float64)
        self.cells = np.asarray(self.cells, dtype=np.int32)
        if self.material_id is None:
            self.material_id = np.zeros(len(self.cells), dtype=np.int32)
        self.material_id = np.asarray(self.material_id, dtype=np.int32)
        if self.flip_normal is None:
            self.flip_normal = np.zeros(len(self.cells), dtype=bool)

    @property
    def dim(self) -> int:
        return self.vertices.shape[1]

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_cells(self) -> int:
        return len(self.cells)

    def merged_with(self, other: "SurfaceMesh", tol: float = 1e-12) -> "SurfaceMesh":
        """Concatenate two meshes, welding coincident vertices."""
        assert self.dim == other.dim
        verts = np.concatenate([self.vertices, other.vertices])
        cells = np.concatenate([self.cells, other.cells + self.n_vertices])
        mat = np.concatenate([self.material_id, other.material_id])
        flip = np.concatenate([self.flip_normal, other.flip_normal])
        # weld duplicate vertices
        rounded = np.round(verts / max(tol, 1e-300)).astype(np.int64)
        _, first, inverse = np.unique(
            rounded, axis=0, return_index=True, return_inverse=True
        )
        order = np.argsort(first)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        new_cells = rank[inverse[cells]]
        new_verts = verts[first[order]]
        # carry exact refinement records through the renumbering
        recs = []
        if self.edge_midpoints is not None and len(self.edge_midpoints):
            recs.append(rank[inverse[self.edge_midpoints]])
        if other.edge_midpoints is not None and len(other.edge_midpoints):
            recs.append(rank[inverse[other.edge_midpoints + self.n_vertices]])
        em = np.concatenate(recs).astype(np.int32) if recs else None
        return SurfaceMesh(new_verts, new_cells, mat, flip, em)


def cell_components_and_closedness(mesh: SurfaceMesh):
    """Connected components of the cell graph (cells sharing any vertex) and
    per-component closedness.

    Returns (cell_labels [Nc] int, closed [n_components] bool).  A component
    is CLOSED when every facet (quad edge in 3D, segment endpoint in 2D)
    appears in exactly two of its cells.  Used by the per-component
    solid-angle correction (`ops.corrections.k_solid_angle_correction` with
    component labels): the constant-field row-sum identity behind the
    reference's K diagonal replacement (`source/bem_stokes.cc:3044-3098`)
    only holds on closed boundaries, so bodies/boxes get the exterior
    alpha = 1 and open walls the flat-screen alpha = 1/2."""
    cells = mesh.cells
    nv = mesh.n_vertices
    parent = np.arange(nv)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for cell in cells:
        r0 = find(cell[0])
        for v in cell[1:]:
            r = find(v)
            if r != r0:
                parent[r] = r0
    vlabel = np.array([find(v) for v in range(nv)])
    _, vlabel = np.unique(vlabel, return_inverse=True)
    cell_labels = vlabel[cells[:, 0]]

    n_comp = int(cell_labels.max()) + 1 if len(cells) else 0
    closed = np.ones(n_comp, dtype=bool)
    if cells.shape[1] == 2:  # 2D: facets are the segment endpoints
        facets = [cells[:, [0]], cells[:, [1]]]
    else:  # 3D quads (lexicographic order): the four edges
        facets = [
            cells[:, [0, 1]],
            cells[:, [1, 3]],
            cells[:, [3, 2]],
            cells[:, [2, 0]],
        ]
    all_facets = np.sort(np.concatenate(facets, axis=0), axis=1)
    fl = np.tile(cell_labels, len(facets))
    if cells.shape[1] != 2 and mesh.edge_midpoints is not None:
        # hanging-node meshes: a coarse edge faces the two fine halves of
        # its neighbor; split every facet with a recorded midpoint so the
        # two sides count against each other (records from refine_uniform)
        mid_of = {
            (min(a, b), max(a, b)): m
            for m, a, b in np.asarray(mesh.edge_midpoints)
        }
        out_f, out_l = [], []
        stack = list(zip(map(tuple, all_facets), fl))
        while stack:
            (a, b), lab = stack.pop()
            m = mid_of.get((min(a, b), max(a, b)))
            if m is None:
                out_f.append((min(a, b), max(a, b)))
                out_l.append(lab)
            else:
                stack.append(((a, m), lab))
                stack.append(((m, b), lab))
        all_facets = np.asarray(out_f, dtype=np.int64)
        fl = np.asarray(out_l)
    # count occurrences of each (component, facet) pair
    key = np.concatenate([fl[:, None], all_facets], axis=1)
    _, inv, counts = np.unique(
        key, axis=0, return_inverse=True, return_counts=True
    )
    bad = counts[inv] != 2
    for lab in np.unique(fl[bad]):
        closed[lab] = False
    return cell_labels, closed
