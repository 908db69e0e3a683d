"""Near-contact detection: how close do distinct surface components (or a
surface and its wall image) get, relative to the local panel size?

The reference handles near-contact accuracy by geometric refinement only
(`refine_walls`, `source/bem_stokes.cc:1478-1519`) with a single global
quadrature order (`:4912-5026`); here the same signal instead auto-promotes
the two-level adaptive quadrature (dense far rule + full-order near-pair
correction, `ops/assemble.py`) whenever the gap drops below the local panel
diameter — the regime where a smooth Gauss rule on the near panels stops
converging (quasi-singular integrands).  See tests/test_near_contact.py for
the measured accuracy-vs-gap curves.

All host-side numpy at problem construction; O(Nc^2) center distances are
chunked.
"""

from __future__ import annotations

import numpy as np


def cell_diameters(vertices: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Max pairwise vertex distance per cell [Nc]."""
    pts = vertices[cells]  # [Nc, nl, d]
    nl = pts.shape[1]
    diam = np.zeros(len(cells))
    for i in range(nl):
        for j in range(i + 1, nl):
            diam = np.maximum(
                diam, np.linalg.norm(pts[:, i] - pts[:, j], axis=-1)
            )
    return diam


def cell_components(cells: np.ndarray, n_vertices: int) -> np.ndarray:
    """Connected-component label per cell (components connect through
    shared vertices).  Iterative union-find."""
    parent = np.arange(n_vertices, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for cell in cells:
        r0 = find(cell[0])
        for v in cell[1:]:
            parent[find(v)] = r0
    roots = np.array([find(c[0]) for c in cells])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def min_intercomponent_gap(mesh):
    """Smallest vertex-to-vertex distance between DISTINCT connected
    components, with the larger local panel diameter adjacent to that
    closest pair.  Returns (gap, local_diam) or None when the mesh has one
    component.  (Vertex distance is a tight panel-diameter-scale gap
    estimate — exactly the resolution the quadrature grading needs.)

    O(N log N) via per-component KD-trees (this runs at every problem
    construction; the naive pairwise sweep allocated GB-scale temporaries
    past ~20k vertices)."""
    from scipy.spatial import cKDTree

    cells = np.asarray(mesh.cells)
    V = np.asarray(mesh.vertices)
    labels = cell_components(cells, len(V))
    if labels.max() == 0:
        return None
    # vertex labels: a vertex takes the label of any containing cell
    vlab = np.full(len(V), -1, dtype=np.int64)
    vlab[cells.ravel()] = np.repeat(labels, cells.shape[1])
    comp_ids = np.unique(labels)
    groups = {c: np.nonzero(vlab == c)[0] for c in comp_ids}
    trees = {c: cKDTree(V[idx]) for c, idx in groups.items()}
    best = (np.inf, -1, -1)
    for a in comp_ids:
        for b in comp_ids:
            if b <= a:
                continue
            d, j = trees[b].query(V[groups[a]], k=1)
            k = int(np.argmin(d))
            if d[k] < best[0]:
                best = (
                    float(d[k]),
                    int(groups[a][k]),
                    int(groups[b][int(j[k])]),
                )
    if not np.isfinite(best[0]):
        return None
    diam = cell_diameters(V, cells)
    touching = np.any(cells == best[1], axis=1) | np.any(
        cells == best[2], axis=1
    )
    return best[0], float(diam[touching].max())


def wall_image_gap(mesh, wall_axis: int, wall_position: float):
    """For the image-kernel wall (free-surface / Blake no-slip): the
    distance from the surface to its mirror image is twice the height above
    the wall plane.  Returns (gap, local_diam_at_closest)."""
    V = np.asarray(mesh.vertices)
    cells = np.asarray(mesh.cells)
    h = np.abs(V[:, wall_axis] - wall_position)
    vmin = int(np.argmin(h))
    gap = 2.0 * float(h[vmin])
    touching = np.any(cells == vmin, axis=1)
    diam = cell_diameters(V, cells)
    local = float(diam[touching].max()) if touching.any() else float(diam.max())
    return gap, local
