"""Mesh sizing fields: curvature-adaptive target edge length with
gradation control.

Reference parity: runmat-meshing/size (background sizing fields driving
tetrahedron generation) + runmat-meshing/cad curvature-based surface
sizing. The field is a per-vertex target-h sampled on the tessellated
shell: h = 2 sin(theta/2) / kappa (the chord length subtending `theta`
of the osculating circle), clamped to [hmin, hmax], then gradation-
limited over the shell's edge graph (h_j <= h_i + (g-1) |x_j - x_i|,
iterated to fixpoint — a vectorized Bellman-Ford relaxation), and
queried by nearest shell vertex (cKDTree).
"""

from __future__ import annotations

import numpy as np


class SizingField:
    """Callable h(x): (n, 3) points -> (n,) target edge lengths."""

    def __init__(self, verts: np.ndarray, h: np.ndarray, edges=None,
                 gradation: float = 1.5):
        self.verts = np.asarray(verts, np.float64)
        self.h = np.asarray(h, np.float64).copy()
        self.gradation = float(gradation)
        if edges is not None and gradation > 1.0:
            self._limit_gradation(np.asarray(edges, np.int64), gradation)
        from scipy.spatial import cKDTree
        self._tree = cKDTree(self.verts)

    def _limit_gradation(self, edges, g):
        """Enforce h_j <= h_i + (g-1)*len(i,j) over the edge graph."""
        a, b = edges[:, 0], edges[:, 1]
        ln = np.linalg.norm(self.verts[a] - self.verts[b], axis=1)
        slack = (g - 1.0) * ln
        for _ in range(64):
            new_b = self.h[a] + slack
            new_a = self.h[b] + slack
            before = self.h.copy()
            np.minimum.at(self.h, b, new_b)
            np.minimum.at(self.h, a, new_a)
            if np.allclose(self.h, before):
                break

    def __call__(self, pts) -> np.ndarray:
        """Gradation-compatible Lipschitz extension off the sample set:
        h(x) = min_i (h_i + (g-1) |x - x_i|), clamped to hmax. Nearest-
        vertex interpolation is WRONG here — sample density is itself
        graded, so interior points far from every sample would resolve
        to whichever feature has the most vertices."""
        pts = np.atleast_2d(np.asarray(pts, np.float64))
        if self.gradation <= 1.0:
            _d, idx = self._tree.query(pts)
            return self.h[idx]
        g1 = self.gradation - 1.0
        hmax = float(self.h.max())
        out = np.empty(pts.shape[0])
        for lo in range(0, pts.shape[0], 4096):
            p = pts[lo:lo + 4096]
            d = np.linalg.norm(p[:, None, :] - self.verts[None, :, :],
                               axis=2)
            out[lo:lo + 4096] = (self.h[None, :] + g1 * d).min(axis=1)
        return np.minimum(out, hmax)

    @property
    def hmin(self) -> float:
        return float(self.h.min())

    @property
    def hmax(self) -> float:
        return float(self.h.max())


def curvature_sizing(model, rel_tol: float = 0.004, theta: float = 0.5,
                     hmin: float = None, hmax: float = None,
                     gradation: float = 1.5):
    """Build a curvature-adaptive SizingField from a BrepModel.

    theta: target angle (radians) each mesh edge may subtend on the
    osculating circle — h = 2 sin(theta/2) / kappa. Flat regions get
    hmax. Returns (field, (verts, faces, ids)) so callers reuse the
    tessellation."""
    v, f, ids = model.tessellate(rel_tol=rel_tol)
    span = float(np.linalg.norm(v.max(axis=0) - v.min(axis=0))) or 1.0
    if hmax is None:
        hmax = span / 6.0
    if hmin is None:
        hmin = hmax / 16.0
    h = np.full(v.shape[0], float(hmax))
    by_face = {}
    for face in model.faces:
        by_face[face.fid] = face.surface
    for fid in np.unique(ids):
        surf = by_face.get(int(fid))
        if surf is None:
            continue
        vidx = np.unique(f[ids == fid].reshape(-1))
        kappa = surf.max_curvature(surf.uv(v[vidx]))
        target = np.where(kappa > 1e-12,
                          2.0 * np.sin(theta / 2.0)
                          / np.maximum(kappa, 1e-12), hmax)
        np.minimum.at(h, vidx, np.clip(target, hmin, hmax))
    edges = np.concatenate([f[:, (0, 1)], f[:, (1, 2)], f[:, (2, 0)]])
    return SizingField(v, h, edges=edges, gradation=gradation), (v, f, ids)


def adaptive_seeds(surf_verts, surf_faces, field, hmax: float = None,
                   rng_seed: int = 0) -> np.ndarray:
    """Octree-adaptive interior seed points honoring a sizing field:
    cells subdivide while their size exceeds h(center); leaf centers
    inside the watertight shell become Delaunay seeds (the graded analog
    of mesh_plc's uniform h-grid; ≙ size-field-driven point placement in
    runmat-meshing/tetrahedron/generate)."""
    from .surface import points_inside
    sv = np.asarray(surf_verts, np.float64)
    lo, hi = sv.min(axis=0), sv.max(axis=0)
    span = float((hi - lo).max())
    if hmax is None:
        hmax = float(getattr(field, "hmax", span / 6.0))
    leaves = []
    queue = [(lo.copy(), span)]
    # expand the root cube to cover the box
    while queue:
        o, s = queue.pop()
        c = o + s / 2.0
        if (o > hi).any() or (o + s < lo).any():
            continue
        if s <= max(float(np.atleast_1d(field(c[None, :]))[0]), 1e-9) \
                or s < span / 256.0:
            leaves.append(c)
            continue
        half = s / 2.0
        for dx in (0.0, half):
            for dy in (0.0, half):
                for dz in (0.0, half):
                    queue.append((o + np.array([dx, dy, dz]), half))
    G = np.array(leaves)
    if not len(G):
        return np.zeros((0, 3))
    rng = np.random.default_rng(rng_seed)
    hloc = np.atleast_1d(field(G))
    G = G + (rng.random(G.shape) - 0.5) * 0.2 * hloc[:, None]
    inside = points_inside(sv, np.asarray(surf_faces, np.int64), G)
    G = G[inside]
    hloc = hloc[inside]
    if not len(G):
        return np.zeros((0, 3))
    # keep seeds clear of the shell SURFACE (not just its vertices —
    # coarse B-rep tessellations have huge facets whose interior is far
    # from every vertex; a seed grazing such a facet makes a sliver)
    from .surface import dist_to_surface
    d = dist_to_surface(sv, surf_faces, G)
    return G[d > 0.4 * hloc]


def discrete_curvature_sizing(verts, faces, theta: float = 0.5,
                              hmin: float = None, hmax: float = None,
                              gradation: float = 1.5,
                              feature_angle: float = 1.0) -> SizingField:
    """Curvature-adaptive sizing from a triangulated shell alone (STL/OBJ
    imports without a B-rep): per-edge curvature is estimated as the
    dihedral turn per unit of surface distance, maxed onto vertices, then
    converted to h like curvature_sizing. Edges turning more than
    `feature_angle` (radians) are sharp CREASES — model features, not
    curvature — and are excluded, as the reference's feature-preserving
    sizing does (runmat-meshing/cad feature detection)."""
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    span = float(np.linalg.norm(v.max(axis=0) - v.min(axis=0))) or 1.0
    if hmax is None:
        hmax = span / 6.0
    if hmin is None:
        hmin = hmax / 16.0
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.where(ln < 1e-300, 1.0, ln)
    edges = np.concatenate([f[:, (0, 1)], f[:, (1, 2)], f[:, (2, 0)]])
    eface = np.tile(np.arange(f.shape[0]), 3)
    key = np.sort(edges, axis=1)
    order = np.lexsort((key[:, 1], key[:, 0]))
    key, eface = key[order], eface[order]
    same = (key[1:] == key[:-1]).all(axis=1)
    a, b = eface[:-1][same], eface[1:][same]          # face pairs
    e = key[:-1][same]
    cosd = np.clip(np.einsum("ij,ij->i", n[a], n[b]), -1.0, 1.0)
    ang = np.arccos(cosd)
    # turn per unit of surface distance: the normals rotate by `ang` over
    # the centroid-to-centroid walk across the edge (exact 1/r on a
    # tessellated cylinder regardless of triangle anisotropy)
    cen = tri.mean(axis=1)
    step = np.linalg.norm(cen[b] - cen[a], axis=1)
    kappa_e = np.where(ang < feature_angle,
                       ang / np.maximum(step, 1e-12), 0.0)
    kappa = np.zeros(v.shape[0])
    np.maximum.at(kappa, e[:, 0], kappa_e)
    np.maximum.at(kappa, e[:, 1], kappa_e)
    h = np.where(kappa > 1e-12,
                 np.clip(2.0 * np.sin(theta / 2.0)
                         / np.maximum(kappa, 1e-12), hmin, hmax), hmax)
    return SizingField(v, h, edges=edges, gradation=gradation)
