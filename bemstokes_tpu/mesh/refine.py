"""Uniform quad refinement with manifold projection — the replacement for
deal.II Triangulation::refine_global + SphericalManifold/CylindricalManifold
(reference attaches manifolds in `read_domain`, `source/bem_stokes.cc:609-887`,
and refines walls locally in `refine_walls`, `:1478-1519`).

Each quad (lexicographic corners v00, v10, v01, v11) splits into 4 children;
new edge-midpoint and center vertices are welded by edge/cell key and then
projected by the (optional) manifold."""

from __future__ import annotations

import numpy as np

from .surface_mesh import SurfaceMesh


class SphericalManifold:
    """Project refinement vertices radially onto the sphere through the
    averaged parent radius (deal.II SphericalManifold behavior for points at
    equal radius)."""

    def __init__(self, center=(0.0, 0.0, 0.0), radius: float | None = None):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = radius  # exact radius for snap(); None = parent-derived

    def project(self, pts: np.ndarray, parent_pts: np.ndarray) -> np.ndarray:
        rel = pts - self.center
        r_new = np.linalg.norm(rel, axis=-1, keepdims=True)
        r_parent = np.mean(
            np.linalg.norm(parent_pts - self.center, axis=-1), axis=-1
        )[:, None]
        return self.center + rel / r_new * r_parent

    def snap(self, pts: np.ndarray) -> np.ndarray:
        """Place points on the EXACT analytic sphere (requires `radius`).
        Mesh files carry only approximate vertex positions (the reference
        sphere meshes have vertex radii in [0.9978, 1.0371]); snapping the
        mapping nodes to the exact manifold is what makes the 1e-6 drag
        validation reachable."""
        if self.radius is None:
            raise ValueError("SphericalManifold.snap needs an explicit radius")
        rel = pts - self.center
        r = np.linalg.norm(rel, axis=-1, keepdims=True)
        return self.center + rel / r * self.radius


class SpheroidManifold:
    """Ellipsoid with semi-axes `radii` centered at `center`: points map to
    unit-sphere coordinates, snap/project there, and map back — the analytic
    manifold for the prolate-spheroid validation configs (BASELINE.md
    lambda=2 mobility)."""

    def __init__(self, radii=(2.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)):
        self.radii = np.asarray(radii, dtype=np.float64)
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = 1.0  # unit radius in mapped coordinates (enables snap)
        self._sphere = SphericalManifold(np.zeros_like(self.center), radius=1.0)

    def snap(self, pts: np.ndarray) -> np.ndarray:
        u = (pts - self.center) / self.radii
        return self._sphere.snap(u) * self.radii + self.center

    def project(self, pts: np.ndarray, parent_pts: np.ndarray) -> np.ndarray:
        u = (pts - self.center) / self.radii
        pu = (parent_pts - self.center) / self.radii
        return self._sphere.project(u, pu) * self.radii + self.center


class CylindricalManifold:
    """Project radially onto the cylinder around `axis` through
    `point_on_axis`, preserving the axial coordinate."""

    def __init__(
        self,
        direction=(0.0, 0.0, 1.0),
        point_on_axis=(0.0, 0.0, 0.0),
        radius: float | None = None,
    ):
        d = np.asarray(direction, dtype=np.float64)
        self.direction = d / np.linalg.norm(d)
        self.point = np.asarray(point_on_axis, dtype=np.float64)
        self.radius = radius

    def snap(self, pts: np.ndarray) -> np.ndarray:
        """Place points on the exact analytic cylinder (requires `radius`)."""
        if self.radius is None:
            raise ValueError("CylindricalManifold.snap needs an explicit radius")
        rel = pts - self.point
        ax = rel @ self.direction
        radial = rel - ax[:, None] * self.direction
        r = np.linalg.norm(radial, axis=-1, keepdims=True)
        safe = np.where(r == 0, 1.0, r)
        return self.point + ax[:, None] * self.direction + radial / safe * self.radius

    def project(self, pts: np.ndarray, parent_pts: np.ndarray) -> np.ndarray:
        rel = pts - self.point
        ax = rel @ self.direction
        radial = rel - ax[:, None] * self.direction
        r_new = np.linalg.norm(radial, axis=-1, keepdims=True)
        prel = parent_pts - self.point
        pax = prel @ self.direction
        pradial = prel - pax[..., None] * self.direction
        r_parent = np.mean(np.linalg.norm(pradial, axis=-1), axis=-1)[:, None]
        safe = np.where(r_new == 0, 1.0, r_new)
        return self.point + ax[:, None] * self.direction + radial / safe * r_parent


def refine_uniform(
    mesh: SurfaceMesh,
    manifold=None,
    cell_filter: np.ndarray | None = None,
    times: int = 1,
) -> SurfaceMesh:
    """Refine every cell (or the `cell_filter` subset — note: filtered
    refinement creates hanging nodes, which the constraint layer must then
    handle) `times` times."""
    for _ in range(times):
        mesh = _refine_once(mesh, manifold, cell_filter)
        cell_filter = None  # filter applies to the first pass only
    return mesh


def _refine_once(mesh: SurfaceMesh, manifold, cell_filter):
    if mesh.dim == 2:
        return _refine_once_lines(mesh, manifold, cell_filter)
    verts = [v for v in mesh.vertices]
    edge_mid: dict[tuple[int, int], int] = {}
    new_cells, new_mats, new_flips = [], [], []
    # exact parent-edge records (mid, a, b) — accumulated across passes so the
    # hanging-node constraint builder never needs a geometric heuristic
    midpoint_records = (
        [tuple(r) for r in mesh.edge_midpoints]
        if mesh.edge_midpoints is not None
        else []
    )

    def midpoint(a: int, b: int, parents) -> int:
        key = (min(a, b), max(a, b))
        if key in edge_mid:
            return edge_mid[key]
        p = 0.5 * (np.asarray(verts[a]) + np.asarray(verts[b]))
        if manifold is not None:
            p = manifold.project(p[None, :], parents[None, :, :])[0]
        verts.append(p)
        edge_mid[key] = len(verts) - 1
        midpoint_records.append((len(verts) - 1, key[0], key[1]))
        return edge_mid[key]

    refine_mask = (
        np.ones(mesh.n_cells, dtype=bool) if cell_filter is None else cell_filter
    )
    for c in range(mesh.n_cells):
        v00, v10, v01, v11 = (int(x) for x in mesh.cells[c])
        mat = mesh.material_id[c]
        flip = mesh.flip_normal[c]
        if not refine_mask[c]:
            new_cells.append([v00, v10, v01, v11])
            new_mats.append(mat)
            new_flips.append(flip)
            continue
        quad = np.asarray([verts[i] for i in (v00, v10, v01, v11)])
        e_b = midpoint(v00, v10, quad[[0, 1]])
        e_t = midpoint(v01, v11, quad[[2, 3]])
        e_l = midpoint(v00, v01, quad[[0, 2]])
        e_r = midpoint(v10, v11, quad[[1, 3]])
        pc = 0.25 * quad.sum(axis=0)
        if manifold is not None:
            pc = manifold.project(pc[None, :], quad[None, :, :])[0]
        verts.append(pc)
        vc = len(verts) - 1
        for child in (
            [v00, e_b, e_l, vc],
            [e_b, v10, vc, e_r],
            [e_l, vc, v01, e_t],
            [vc, e_r, e_t, v11],
        ):
            new_cells.append(child)
            new_mats.append(mat)
            new_flips.append(flip)

    return SurfaceMesh(
        np.asarray(verts),
        np.asarray(new_cells, dtype=np.int32),
        np.asarray(new_mats, dtype=np.int32),
        np.asarray(new_flips, dtype=bool),
        np.asarray(midpoint_records, dtype=np.int32).reshape(-1, 3),
    )


def _refine_once_lines(mesh: SurfaceMesh, manifold, cell_filter):
    """Split each line cell (2D problems) at its (manifold-projected)
    midpoint."""
    verts = [v for v in mesh.vertices]
    new_cells, new_mats, new_flips = [], [], []
    refine_mask = (
        np.ones(mesh.n_cells, dtype=bool) if cell_filter is None else cell_filter
    )
    for c in range(mesh.n_cells):
        v0, v1 = (int(x) for x in mesh.cells[c])
        if not refine_mask[c]:
            new_cells.append([v0, v1])
            new_mats.append(mesh.material_id[c])
            new_flips.append(mesh.flip_normal[c])
            continue
        seg = np.asarray([verts[v0], verts[v1]])
        pm = 0.5 * seg.sum(axis=0)
        if manifold is not None:
            pm = manifold.project(pm[None, :], seg[None, :, :])[0]
        verts.append(pm)
        vm = len(verts) - 1
        for child in ([v0, vm], [vm, v1]):
            new_cells.append(child)
            new_mats.append(mesh.material_id[c])
            new_flips.append(mesh.flip_normal[c])
    return SurfaceMesh(
        np.asarray(verts),
        np.asarray(new_cells, dtype=np.int32),
        np.asarray(new_mats, dtype=np.int32),
        np.asarray(new_flips, dtype=bool),
    )


# ----------------------------------------------------------------------
# Anisotropy removal (reference `GridTools::remove_anisotropy` applied in
# `read_domain` when `remove_tria_anisotropies` is set,
# `source/bem_stokes.cc:662-664`, to frame trias `:2305-2307`, and
# unconditionally to imported cylinder walls `:1050, 1098`).


def _anisotropy_cuts(mesh: SurfaceMesh, max_ratio: float) -> np.ndarray:
    """Per-cell cut decision: 0 = keep, 1 = cut along parametric x (the cell
    is long in x), 2 = cut along y.  Edge lengths are averaged over the two
    parallel edges of the (lexicographic) quad."""
    V, C = mesh.vertices, mesh.cells
    lx = 0.5 * (
        np.linalg.norm(V[C[:, 1]] - V[C[:, 0]], axis=1)
        + np.linalg.norm(V[C[:, 3]] - V[C[:, 2]], axis=1)
    )
    ly = 0.5 * (
        np.linalg.norm(V[C[:, 2]] - V[C[:, 0]], axis=1)
        + np.linalg.norm(V[C[:, 3]] - V[C[:, 1]], axis=1)
    )
    cuts = np.zeros(len(C), dtype=np.int8)
    cuts[lx > max_ratio * ly] = 1
    cuts[ly > max_ratio * lx] = 2
    return cuts


def _cut_cells(mesh: SurfaceMesh, cuts: np.ndarray, manifold=None) -> SurfaceMesh:
    """Apply anisotropic cuts (deal.II RefinementCase::cut_x / cut_y for
    quads): each flagged cell splits into two children along its long
    parametric axis.  Midpoints are recorded in `edge_midpoints` so hanging
    nodes against uncut neighbors stay exactly constrained."""
    verts = [v for v in mesh.vertices]
    edge_mid: dict[tuple[int, int], int] = {}
    midpoint_records = (
        [tuple(r) for r in mesh.edge_midpoints]
        if mesh.edge_midpoints is not None
        else []
    )

    def midpoint(a: int, b: int, parents) -> int:
        key = (min(a, b), max(a, b))
        if key in edge_mid:
            return edge_mid[key]
        p = 0.5 * (np.asarray(verts[a]) + np.asarray(verts[b]))
        if manifold is not None:
            p = manifold.project(p[None, :], parents[None, :, :])[0]
        verts.append(p)
        edge_mid[key] = len(verts) - 1
        midpoint_records.append((len(verts) - 1, key[0], key[1]))
        return edge_mid[key]

    new_cells, new_mats, new_flips = [], [], []
    for c in range(mesh.n_cells):
        v00, v10, v01, v11 = (int(x) for x in mesh.cells[c])
        mat, flip = mesh.material_id[c], mesh.flip_normal[c]
        quad = np.asarray([verts[i] for i in (v00, v10, v01, v11)])
        if cuts[c] == 1:  # long in x: cut the two x-edges
            m_b = midpoint(v00, v10, quad[[0, 1]])
            m_t = midpoint(v01, v11, quad[[2, 3]])
            children = ([v00, m_b, v01, m_t], [m_b, v10, m_t, v11])
        elif cuts[c] == 2:  # long in y: cut the two y-edges
            m_l = midpoint(v00, v01, quad[[0, 2]])
            m_r = midpoint(v10, v11, quad[[1, 3]])
            children = ([v00, v10, m_l, m_r], [m_l, m_r, v01, v11])
        else:
            children = ([v00, v10, v01, v11],)
        for child in children:
            new_cells.append(child)
            new_mats.append(mat)
            new_flips.append(flip)
    return SurfaceMesh(
        np.asarray(verts),
        np.asarray(new_cells, dtype=np.int32),
        np.asarray(new_mats, dtype=np.int32),
        np.asarray(new_flips, dtype=bool),
        np.asarray(midpoint_records, dtype=np.int32).reshape(-1, 3),
    )


def remove_anisotropy(
    mesh: SurfaceMesh,
    max_ratio: float = 1.6180339887,
    max_iterations: int = 5,
    manifold=None,
    plan: list | None = None,
):
    """Cut elongated quads along their long parametric axis until every
    cell's edge-length ratio is below `max_ratio` (deal.II
    `GridTools::remove_anisotropy` defaults; reference usage
    `source/bem_stokes.cc:662-664, 2305-2307`).

    Returns (mesh, plan).  The returned `plan` (the per-pass cut arrays
    actually executed) can be passed back in to REPLAY identical cuts on a
    same-topology mesh with different geometry — gait frame meshes must all
    end up with the same connectivity, so the frame-0 decisions are replayed
    on every later frame (the reference re-runs the geometric test per frame
    and relies on the gait preserving cell shape; replay makes the topology
    invariance explicit).  2D line meshes are returned unchanged (a line has
    one parametric direction)."""
    if mesh.cells.shape[1] != 4:
        return mesh, []
    executed: list[np.ndarray] = []
    it = 0
    while True:
        if plan is not None:
            if it >= len(plan):
                break
            cuts = plan[it]
            if len(cuts) != mesh.cells.shape[0]:
                raise ValueError(
                    f"remove_anisotropy plan replay: pass {it} recorded "
                    f"{len(cuts)} cells but this frame's mesh has "
                    f"{mesh.cells.shape[0]} — gait frame topology differs "
                    "from the frame the plan was recorded on"
                )
        else:
            if it >= max_iterations:
                break
            cuts = _anisotropy_cuts(mesh, max_ratio)
            if not cuts.any():
                break
        mesh = _cut_cells(mesh, cuts, manifold)
        executed.append(np.asarray(cuts))
        it += 1
    return mesh, executed
