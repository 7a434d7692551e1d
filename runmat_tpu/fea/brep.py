"""B-rep geometry kernel: analytic + B-spline surfaces, topology with
stable face IDs, and UV-domain tessellation.

Reference parity: the reference's CAD stack links OCCT for its B-rep model
and face meshing (/root/reference/crates/runmat-geometry/io/src/occt/
occt_bridge.cc, geometry/core/src/) and tessellates faces for the meshing
pipeline (runmat-meshing/cad). This build implements the geometric kernel
directly, the array-native way:

  * every surface exposes the same vectorized interface — ``point(uv)``,
    ``uv(points)`` (principal branch), periods, natural domain — so one
    tessellator covers planes, cylinders, cones, spheres, tori and
    (rational) B-spline patches;
  * each EDGE is discretized ONCE against the chordal tolerance and the
    polyline is shared by both adjacent faces, so the tessellated shell is
    watertight by construction;
  * face interiors are triangulated in the UV domain (ear clipping with
    hole bridging; periodic faces are cut along a seam whose two sides are
    sampled identically and weld back together), then refined by 3-D chord
    error with all boundary edges frozen;
  * every output triangle carries its face's integer ID — the selection
    mechanism that lets boundary conditions and loads address faces
    downstream (≙ the reference's face-selection diagnostics tier).
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------- #
# frames
# --------------------------------------------------------------------------- #

class Frame:
    """Right-handed placement frame (origin o; axes x, y, z = x cross y)."""

    __slots__ = ("o", "x", "y", "z")

    def __init__(self, o, z=None, x=None):
        self.o = np.asarray(o, np.float64)
        z = np.array([0.0, 0.0, 1.0]) if z is None else np.asarray(z, float)
        self.z = z / (np.linalg.norm(z) or 1.0)
        if x is None:
            x = _any_perp(self.z)
        x = np.asarray(x, np.float64)
        x = x - (x @ self.z) * self.z
        self.x = x / (np.linalg.norm(x) or 1.0)
        self.y = np.cross(self.z, self.x)

    def to_local(self, p):
        d = np.asarray(p, np.float64) - self.o
        return np.stack([d @ self.x, d @ self.y, d @ self.z], axis=-1)

    def from_local(self, q):
        q = np.asarray(q, np.float64)
        return (self.o + q[..., :1] * self.x + q[..., 1:2] * self.y
                + q[..., 2:3] * self.z)


def _any_perp(z):
    v = np.array([1.0, 0.0, 0.0])
    if abs(float(z @ v)) > 0.9:
        v = np.array([0.0, 1.0, 0.0])
    v = v - (v @ z) * z
    return v / np.linalg.norm(v)


# --------------------------------------------------------------------------- #
# surfaces
# --------------------------------------------------------------------------- #

class Surface:
    """Vectorized parametric surface. uv arrays are (n, 2) float64."""

    periods = (None, None)           # (u, v) period or None

    def point(self, uv):             # (n,2) -> (n,3)
        raise NotImplementedError

    def uv(self, pts):               # (n,3) -> (n,2), principal branch
        raise NotImplementedError

    def degenerate(self, pts):
        """Mask of points where u (the periodic param) is undefined."""
        return np.zeros(np.asarray(pts).reshape(-1, 3).shape[0], bool)

    def uv_scales(self):
        """(su, sv) metric scale factors: 3-D distance per unit of u/v,
        used to make UV triangulation approximately isotropic."""
        return 1.0, 1.0

    def natural_domain(self):
        """((u0,u1),(v0,v1)) for closed tessellation; None if unbounded."""
        return None

    def is_planar(self):
        return False

    def max_curvature(self, uv):
        """|largest principal curvature| at each uv (n,) — drives the
        curvature-adaptive sizing field (≙ runmat-meshing/size). The
        generic path evaluates the fundamental forms numerically;
        analytic surfaces override with closed forms."""
        uv = np.asarray(uv, np.float64)
        su, sv = self.uv_scales()
        hu, hv = 1e-4 / max(su, 1e-12), 1e-4 / max(sv, 1e-12)
        du = np.array([hu, 0.0])
        dv = np.array([0.0, hv])
        P = self.point(uv)
        Pu = (self.point(uv + du) - self.point(uv - du)) / (2 * hu)
        Pv = (self.point(uv + dv) - self.point(uv - dv)) / (2 * hv)
        Puu = (self.point(uv + du) - 2 * P + self.point(uv - du)) / hu ** 2
        Pvv = (self.point(uv + dv) - 2 * P + self.point(uv - dv)) / hv ** 2
        Puv = (self.point(uv + du + dv) - self.point(uv + du - dv)
               - self.point(uv - du + dv) + self.point(uv - du - dv)) \
            / (4 * hu * hv)
        n = np.cross(Pu, Pv)
        nn = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.where(nn < 1e-300, 1.0, nn)
        E = np.einsum("ij,ij->i", Pu, Pu)
        F = np.einsum("ij,ij->i", Pu, Pv)
        G = np.einsum("ij,ij->i", Pv, Pv)
        L = np.einsum("ij,ij->i", Puu, n)
        M = np.einsum("ij,ij->i", Puv, n)
        N = np.einsum("ij,ij->i", Pvv, n)
        den = E * G - F * F
        den = np.where(np.abs(den) < 1e-300, 1.0, den)
        H = (E * N - 2 * F * M + G * L) / (2 * den)     # mean curvature
        K = (L * N - M * M) / den                       # Gaussian
        disc = np.sqrt(np.maximum(H * H - K, 0.0))
        return np.maximum(np.abs(H + disc), np.abs(H - disc))


class Plane(Surface):
    def __init__(self, frame: Frame):
        self.f = frame

    def point(self, uv):
        uv = np.asarray(uv, np.float64)
        q = np.concatenate([uv, np.zeros_like(uv[:, :1])], axis=1)
        return self.f.from_local(q)

    def uv(self, pts):
        return self.f.to_local(pts)[:, :2]

    def is_planar(self):
        return True

    def max_curvature(self, uv):
        return np.zeros(np.asarray(uv).reshape(-1, 2).shape[0])


class Cylinder(Surface):
    """S(u,v) = o + r(cos u x + sin u y) + v z  (Part 42 cylindrical)."""

    def __init__(self, frame: Frame, r: float):
        self.f, self.r = frame, float(r)
        self.periods = (2 * np.pi, None)

    def point(self, uv):
        uv = np.asarray(uv, np.float64)
        u, v = uv[:, 0], uv[:, 1]
        q = np.stack([self.r * np.cos(u), self.r * np.sin(u), v], axis=1)
        return self.f.from_local(q)

    def uv(self, pts):
        q = self.f.to_local(pts)
        return np.stack([np.arctan2(q[:, 1], q[:, 0]), q[:, 2]], axis=1)

    def uv_scales(self):
        return self.r, 1.0

    def max_curvature(self, uv):
        n = np.asarray(uv).reshape(-1, 2).shape[0]
        return np.full(n, 1.0 / max(abs(self.r), 1e-12))


class Cone(Surface):
    """S(u,v) = o + (r + v sin a)(cos u x + sin u y) + v cos a z
    (Part 42 conical_surface: radius at the reference plane, half-angle a).
    """

    def __init__(self, frame: Frame, r: float, semi_angle: float):
        self.f, self.r, self.a = frame, float(r), float(semi_angle)
        self.periods = (2 * np.pi, None)

    def point(self, uv):
        uv = np.asarray(uv, np.float64)
        u, v = uv[:, 0], uv[:, 1]
        rad = self.r + v * np.sin(self.a)
        q = np.stack([rad * np.cos(u), rad * np.sin(u),
                      v * np.cos(self.a)], axis=1)
        return self.f.from_local(q)

    def uv(self, pts):
        q = self.f.to_local(pts)
        u = np.arctan2(q[:, 1], q[:, 0])
        v = q[:, 2] / np.cos(self.a)
        return np.stack([u, v], axis=1)

    def degenerate(self, pts):
        q = self.f.to_local(pts)
        scale = abs(self.r) + 1.0
        return np.hypot(q[:, 0], q[:, 1]) < 1e-9 * scale

    def uv_scales(self):
        return max(abs(self.r), 1e-6), 1.0

    def max_curvature(self, uv):
        uv = np.asarray(uv, np.float64).reshape(-1, 2)
        rad = np.abs(self.r + uv[:, 1] * np.sin(self.a))
        return np.abs(np.cos(self.a)) / np.maximum(rad, 1e-12)


class SphereSurf(Surface):
    """S(u,v) = o + r(cos v cos u x + cos v sin u y + sin v z)."""

    def __init__(self, frame: Frame, r: float):
        self.f, self.r = frame, float(r)
        self.periods = (2 * np.pi, None)

    def point(self, uv):
        uv = np.asarray(uv, np.float64)
        u, v = uv[:, 0], uv[:, 1]
        cv = np.cos(v)
        q = self.r * np.stack([cv * np.cos(u), cv * np.sin(u),
                               np.sin(v)], axis=1)
        return self.f.from_local(q)

    def uv(self, pts):
        q = self.f.to_local(pts)
        v = np.arcsin(np.clip(q[:, 2] / self.r, -1.0, 1.0))
        u = np.arctan2(q[:, 1], q[:, 0])
        return np.stack([u, v], axis=1)

    def degenerate(self, pts):
        q = self.f.to_local(pts)
        return np.hypot(q[:, 0], q[:, 1]) < 1e-9 * self.r

    def uv_scales(self):
        return self.r, self.r

    def natural_domain(self):
        return (0.0, 2 * np.pi), (-np.pi / 2, np.pi / 2)

    def max_curvature(self, uv):
        n = np.asarray(uv).reshape(-1, 2).shape[0]
        return np.full(n, 1.0 / max(abs(self.r), 1e-12))


class Torus(Surface):
    """S(u,v) = o + (R + r cos v)(cos u x + sin u y) + r sin v z."""

    def __init__(self, frame: Frame, R: float, r: float):
        self.f, self.R, self.r = frame, float(R), float(r)
        self.periods = (2 * np.pi, 2 * np.pi)

    def point(self, uv):
        uv = np.asarray(uv, np.float64)
        u, v = uv[:, 0], uv[:, 1]
        rad = self.R + self.r * np.cos(v)
        q = np.stack([rad * np.cos(u), rad * np.sin(u),
                      self.r * np.sin(v)], axis=1)
        return self.f.from_local(q)

    def uv(self, pts):
        q = self.f.to_local(pts)
        d = np.hypot(q[:, 0], q[:, 1])
        u = np.arctan2(q[:, 1], q[:, 0])
        v = np.arctan2(q[:, 2], d - self.R)
        return np.stack([u, v], axis=1)

    def uv_scales(self):
        return self.R, self.r

    def natural_domain(self):
        return (0.0, 2 * np.pi), (0.0, 2 * np.pi)

    def max_curvature(self, uv):
        uv = np.asarray(uv, np.float64).reshape(-1, 2)
        v = uv[:, 1]
        k2 = np.abs(np.cos(v)) / np.maximum(
            np.abs(self.R + self.r * np.cos(v)), 1e-12)
        return np.maximum(1.0 / max(abs(self.r), 1e-12), k2)




# --------------------------------------------------------------------------- #
# B-spline basis (Cox-de Boor, vectorized over parameter arrays)
# --------------------------------------------------------------------------- #

def bspline_basis(deg: int, knots: np.ndarray, t: np.ndarray):
    """Nonzero basis values at each t.

    Returns (N, span): N is (len(t), deg+1) — the values of basis functions
    span-deg .. span — and span the knot-span index per t (clamped so the
    domain endpoints evaluate in the last/first real span)."""
    knots = np.asarray(knots, np.float64)
    t = np.asarray(t, np.float64).reshape(-1)
    nctrl = knots.size - deg - 1
    lo, hi = knots[deg], knots[nctrl]
    tt = np.clip(t, lo, hi)
    span = np.searchsorted(knots, tt, side="right") - 1
    span = np.clip(span, deg, nctrl - 1)
    N = np.zeros((tt.size, deg + 1))
    N[:, 0] = 1.0
    left = np.zeros((tt.size, deg + 1))
    right = np.zeros((tt.size, deg + 1))
    for j in range(1, deg + 1):
        left[:, j] = tt - knots[span + 1 - j]
        right[:, j] = knots[span + j] - tt
        saved = np.zeros(tt.size)
        for r in range(j):
            denom = right[:, r + 1] + left[:, j - r]
            safe = np.where(denom == 0.0, 1.0, denom)
            temp = np.where(denom == 0.0, 0.0, N[:, r] / safe)
            N[:, r] = saved + right[:, r + 1] * temp
            saved = left[:, j - r] * temp
        N[:, j] = saved
    return N, span


class BSplineSurface(Surface):
    """(Rational) tensor-product B-spline patch.

    ctrl: (nu, nv, 3) control net; w: (nu, nv) weights or None.
    Knot vectors are the expanded (multiplicity-repeated) form."""

    def __init__(self, du, dv, uknots, vknots, ctrl, w=None):
        self.du, self.dv = int(du), int(dv)
        self.uk = np.asarray(uknots, np.float64)
        self.vk = np.asarray(vknots, np.float64)
        self.ctrl = np.asarray(ctrl, np.float64)
        self.w = None if w is None else np.asarray(w, np.float64)

    def natural_domain(self):
        u0, u1 = self.uk[self.du], self.uk[self.ctrl.shape[0]]
        v0, v1 = self.vk[self.dv], self.vk[self.ctrl.shape[1]]
        return (float(u0), float(u1)), (float(v0), float(v1))

    def point(self, uv):
        uv = np.asarray(uv, np.float64).reshape(-1, 2)
        Nu, su = bspline_basis(self.du, self.uk, uv[:, 0])
        Nv, sv = bspline_basis(self.dv, self.vk, uv[:, 1])
        iu = su[:, None] - self.du + np.arange(self.du + 1)[None, :]
        iv = sv[:, None] - self.dv + np.arange(self.dv + 1)[None, :]
        P = self.ctrl[iu[:, :, None], iv[:, None, :]]   # (n, du+1, dv+1, 3)
        if self.w is not None:
            W = self.w[iu[:, :, None], iv[:, None, :]]
            num = np.einsum("ni,nj,nijk->nk", Nu, Nv, P * W[..., None])
            den = np.einsum("ni,nj,nij->n", Nu, Nv, W)
            return num / den[:, None]
        return np.einsum("ni,nj,nijk->nk", Nu, Nv, P)

    def uv(self, pts):
        """Closest-point inversion: coarse grid seed + damped Newton on the
        squared distance with numeric partials (the patches this importer
        meets are mild; OCCT uses the same seed+iterate scheme)."""
        pts = np.asarray(pts, np.float64).reshape(-1, 3)
        (u0, u1), (v0, v1) = self.natural_domain()
        gu = np.linspace(u0, u1, 24)
        gv = np.linspace(v0, v1, 24)
        G = np.stack(np.meshgrid(gu, gv, indexing="ij"), axis=-1).reshape(-1, 2)
        SG = self.point(G)
        out = np.empty((pts.shape[0], 2))
        hu, hv = (u1 - u0) * 1e-6, (v1 - v0) * 1e-6
        for i, p in enumerate(pts):
            k = int(np.argmin(((SG - p) ** 2).sum(axis=1)))
            uv = G[k].copy()
            for _ in range(30):
                s0 = self.point(uv[None, :])[0]
                r = s0 - p
                if (r @ r) < 1e-24:
                    break
                su = (self.point(uv[None, :] + [hu, 0])[0] - s0) / hu
                sv = (self.point(uv[None, :] + [0, hv])[0] - s0) / hv
                J = np.array([[su @ su, su @ sv], [su @ sv, sv @ sv]])
                g = np.array([su @ r, sv @ r])
                try:
                    d = np.linalg.solve(J + 1e-12 * np.eye(2), g)
                except np.linalg.LinAlgError:
                    break
                uv = uv - d
                uv[0] = min(max(uv[0], u0), u1)
                uv[1] = min(max(uv[1], v0), v1)
                if (d @ d) < 1e-20 * max(u1 - u0, v1 - v0) ** 2:
                    break
            out[i] = uv
        return out

    def uv_scales(self):
        (u0, u1), (v0, v1) = self.natural_domain()
        # metric from the control-net extent
        ext = np.linalg.norm(self.ctrl[-1, 0] - self.ctrl[0, 0]) or 1.0
        ext2 = np.linalg.norm(self.ctrl[0, -1] - self.ctrl[0, 0]) or 1.0
        return ext / max(u1 - u0, 1e-12), ext2 / max(v1 - v0, 1e-12)


# --------------------------------------------------------------------------- #
# curves
# --------------------------------------------------------------------------- #

class Curve:
    def point(self, t):              # (n,) -> (n,3)
        raise NotImplementedError

    def param_of(self, p):           # (3,) -> float, principal branch
        raise NotImplementedError

    period = None


class LineCurve(Curve):
    """C(t) = p0 + t * vec (vec carries the STEP VECTOR magnitude)."""

    def __init__(self, p0, vec):
        self.p0 = np.asarray(p0, np.float64)
        self.vec = np.asarray(vec, np.float64)

    def point(self, t):
        t = np.asarray(t, np.float64).reshape(-1, 1)
        return self.p0 + t * self.vec

    def param_of(self, p):
        d = self.vec @ self.vec
        return float((np.asarray(p) - self.p0) @ self.vec / (d or 1.0))


class CircleCurve(Curve):
    def __init__(self, frame: Frame, r: float):
        self.f, self.r = frame, float(r)
        self.period = 2 * np.pi

    def point(self, t):
        t = np.asarray(t, np.float64).reshape(-1)
        q = self.r * np.stack([np.cos(t), np.sin(t),
                               np.zeros_like(t)], axis=1)
        return self.f.from_local(q)

    def param_of(self, p):
        q = self.f.to_local(np.asarray(p, np.float64)[None, :])[0]
        return float(np.arctan2(q[1], q[0]))


class EllipseCurve(Curve):
    def __init__(self, frame: Frame, a: float, b: float):
        self.f, self.a, self.b = frame, float(a), float(b)
        self.period = 2 * np.pi

    def point(self, t):
        t = np.asarray(t, np.float64).reshape(-1)
        q = np.stack([self.a * np.cos(t), self.b * np.sin(t),
                      np.zeros_like(t)], axis=1)
        return self.f.from_local(q)

    def param_of(self, p):
        q = self.f.to_local(np.asarray(p, np.float64)[None, :])[0]
        return float(np.arctan2(q[1] / self.b, q[0] / self.a))


class BSplineCurve(Curve):
    def __init__(self, deg, knots, ctrl, w=None):
        self.deg = int(deg)
        self.k = np.asarray(knots, np.float64)
        self.ctrl = np.asarray(ctrl, np.float64)
        self.w = None if w is None else np.asarray(w, np.float64)

    def domain(self):
        return float(self.k[self.deg]), float(self.k[self.ctrl.shape[0]])

    def point(self, t):
        N, span = bspline_basis(self.deg, self.k, t)
        idx = span[:, None] - self.deg + np.arange(self.deg + 1)[None, :]
        P = self.ctrl[idx]                         # (n, deg+1, 3)
        if self.w is not None:
            W = self.w[idx]
            num = np.einsum("ni,nik->nk", N * W, P)
            return num / (N * W).sum(axis=1)[:, None]
        return np.einsum("ni,nik->nk", N, P)

    def param_of(self, p):
        t0, t1 = self.domain()
        ts = np.linspace(t0, t1, 256)
        C = self.point(ts)
        k = int(np.argmin(((C - np.asarray(p)) ** 2).sum(axis=1)))
        t = float(ts[k])
        h = (t1 - t0) * 1e-7
        for _ in range(25):
            c = self.point(np.array([t]))[0]
            d = self.point(np.array([min(t + h, t1)]))[0] - c
            dd = d @ d
            if dd < 1e-30:
                break
            step = -((c - np.asarray(p)) @ d) / dd * h
            t = min(max(t + step, t0), t1)
            if abs(step) < 1e-14 * (t1 - t0):
                break
        return t


# --------------------------------------------------------------------------- #
# topology
# --------------------------------------------------------------------------- #

class BrepEdge:
    """Trimmed curve with endpoint parameters; discretized once, shared by
    both adjacent faces (watertightness by construction)."""

    __slots__ = ("eid", "curve", "t0", "t1", "p0", "p1", "_poly")

    def __init__(self, eid, curve, p0, p1, forward=True):
        """forward=False: the edge runs p0 -> p1 against the curve's
        parameter direction (STEP EDGE_CURVE same_sense = .F.)."""
        self.eid = eid
        self.curve = curve
        self.p0 = np.asarray(p0, np.float64)
        self.p1 = np.asarray(p1, np.float64)
        t0 = curve.param_of(self.p0)
        t1 = curve.param_of(self.p1)
        if curve.period is not None:
            if np.allclose(self.p0, self.p1, atol=1e-9):
                t1 = t0 + curve.period if forward else t0 - curve.period
            elif forward and t1 <= t0:
                t1 += curve.period
            elif not forward and t1 >= t0:
                t1 -= curve.period
        self.t0, self.t1 = float(t0), float(t1)
        self._poly = None

    def polyline(self, tol):
        """Adaptive chordal discretization from p0 to p1 (cached)."""
        if self._poly is not None:
            return self._poly
        ts = [self.t0, self.t1]
        pts = [self.curve.point(np.array([self.t0]))[0],
               self.curve.point(np.array([self.t1]))[0]]
        i = 0
        while i < len(ts) - 1 and len(ts) < 512:
            tm = 0.5 * (ts[i] + ts[i + 1])
            pm = self.curve.point(np.array([tm]))[0]
            chord = 0.5 * (pts[i] + pts[i + 1])
            if np.linalg.norm(pm - chord) > tol or \
                    (self.curve.period is not None
                     and abs(ts[i + 1] - ts[i]) > 0.5 * np.pi):
                ts.insert(i + 1, tm)
                pts.insert(i + 1, pm)
            else:
                i += 1
        pts[0], pts[-1] = self.p0, self.p1      # exact shared endpoints
        self._poly = np.asarray(pts)
        return self._poly


class BrepFace:
    """loops: list of loops; each loop is either a list of (BrepEdge, bool
    sense) pairs or a single 3-D point (a degenerate VERTEX_LOOP — cone
    apex, sphere pole)."""

    __slots__ = ("fid", "surface", "loops", "same_sense", "stype")

    def __init__(self, fid, surface, loops, same_sense=True, stype=""):
        self.fid = int(fid)
        self.surface = surface
        self.loops = loops
        self.same_sense = bool(same_sense)
        self.stype = stype


class BrepModel:
    """An ordered face set; tessellate() emits the welded shell with
    per-triangle face IDs."""

    def __init__(self, faces):
        self.faces = list(faces)

    def tessellate(self, rel_tol=0.004, tol=None):
        pts_all = []
        for f in self.faces:
            for lp in f.loops:
                if isinstance(lp, np.ndarray):
                    pts_all.append(lp[None, :])
                else:
                    for e, _ in lp:
                        pts_all.append(np.stack([e.p0, e.p1]))
            if isinstance(f.surface, (SphereSurf, Torus)):
                c = f.surface.f.o
                r = getattr(f.surface, "r", 0.0) + \
                    getattr(f.surface, "R", 0.0)
                pts_all.append(np.stack([c - r, c + r]))
            if isinstance(f.surface, BSplineSurface):
                pts_all.append(f.surface.ctrl.reshape(-1, 3))
        P = np.vstack(pts_all) if pts_all else np.zeros((1, 3))
        diag = float(np.linalg.norm(P.max(axis=0) - P.min(axis=0))) or 1.0
        if tol is None:
            tol = rel_tol * diag
        tris = []
        fids = []
        for f in self.faces:
            t3 = tessellate_face(f, tol)
            if t3.size:
                tris.append(t3)
                fids.append(np.full(t3.shape[0], f.fid, np.int64))
        if not tris:
            return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                    np.zeros(0, np.int64))
        soup = np.vstack(tris)
        ids = np.concatenate(fids)
        from .surface import weld_vertices
        wtol = max(1e-9, 1e-7 * diag)
        v, fc = weld_vertices(soup, tol=wtol)
        # drop triangles degenerated by welding (pole caps, seams)
        ok = (fc[:, 0] != fc[:, 1]) & (fc[:, 1] != fc[:, 2]) & \
             (fc[:, 0] != fc[:, 2])
        return v, fc[ok], ids[ok]


# --------------------------------------------------------------------------- #
# polygon machinery (scaled-UV plane)
# --------------------------------------------------------------------------- #

def signed_area(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ear_clip(poly):
    """Triangulate a simple polygon (duplicated bridge vertices allowed).
    Returns index triples, CCW in the input plane."""
    poly = np.asarray(poly, np.float64)
    n = poly.shape[0]
    if n < 3:
        return []
    idx = list(range(n))
    if signed_area(poly) < 0:
        idx.reverse()
    ext = float(np.abs(poly).max()) or 1.0
    eps = 1e-12 * ext * ext
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 20 * n:
        guard += 1
        found = False
        m = len(idx)
        for k in range(m):
            a, b, c = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            pa, pb, pc = poly[a], poly[b], poly[c]
            cross = (pb[0] - pa[0]) * (pc[1] - pa[1]) - \
                (pb[1] - pa[1]) * (pc[0] - pa[0])
            if cross <= eps:
                continue                        # reflex or degenerate
            ok = True
            for j in idx:
                if j in (a, b, c):
                    continue
                p = poly[j]
                # vertices coincident with an ear corner (bridge
                # duplicates) never block the ear
                if min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
                       for q in (pa, pb, pc)) < eps:
                    continue
                d1 = (pb[0] - pa[0]) * (p[1] - pa[1]) - \
                    (pb[1] - pa[1]) * (p[0] - pa[0])
                d2 = (pc[0] - pb[0]) * (p[1] - pb[1]) - \
                    (pc[1] - pb[1]) * (p[0] - pb[0])
                d3 = (pa[0] - pc[0]) * (p[1] - pc[1]) - \
                    (pa[1] - pc[1]) * (p[0] - pc[0])
                if d1 >= -eps and d2 >= -eps and d3 >= -eps:
                    ok = False
                    break
            if ok:
                tris.append((a, b, c))
                idx.pop(k)
                found = True
                break
        if not found:
            break
    if len(idx) == 3:
        tris.append(tuple(idx))
    elif len(idx) > 3:                          # numerically stuck: fan
        for k in range(1, len(idx) - 1):
            tris.append((idx[0], idx[k], idx[k + 1]))
    return tris


def _seg_intersects(a, b, c, d, eps):
    """Proper crossing of segments ab and cd (shared endpoints excluded)."""
    def orient(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
    for p in (c, d):
        if ((p[0] - a[0]) ** 2 + (p[1] - a[1]) ** 2 < eps or
                (p[0] - b[0]) ** 2 + (p[1] - b[1]) ** 2 < eps):
            return False
    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    return (o1 * o2 < -eps) and (o3 * o4 < -eps)


def merge_holes(outer, holes):
    """Bridge hole loops into the outer polygon (duplicating the bridge
    endpoints so both bridge sides weld in 3-D). outer CCW, holes any
    winding. Returns one simple polygon as a point array."""
    outer = list(np.asarray(outer, np.float64))
    if signed_area(np.asarray(outer)) < 0:
        outer.reverse()
    ext = float(np.abs(np.asarray(outer)).max()) or 1.0
    eps = 1e-18 * ext * ext
    for hole in sorted(holes, key=lambda h: -float(np.max(h[:, 0]))):
        hole = list(np.asarray(hole, np.float64))
        if signed_area(np.asarray(hole)) > 0:
            hole.reverse()                      # holes run CW
        hi = int(np.argmax([p[0] for p in hole]))
        h = hole[hi]
        order = sorted(range(len(outer)),
                       key=lambda i: (outer[i][0] - h[0]) ** 2
                       + (outer[i][1] - h[1]) ** 2)
        all_edges = []
        polys = [outer] + [hole]
        for poly in polys:
            for i in range(len(poly)):
                all_edges.append((poly[i], poly[(i + 1) % len(poly)]))
        pick = None
        for oi in order:
            o = outer[oi]
            if not any(_seg_intersects(h, o, e0, e1, eps)
                       for e0, e1 in all_edges):
                pick = oi
                break
        if pick is None:
            pick = order[0]
        rot = hole[hi:] + hole[:hi]
        outer = (outer[:pick + 1] + rot + [rot[0]] + outer[pick:])
    return np.asarray(outer)


# --------------------------------------------------------------------------- #
# chord-error refinement (boundary edges frozen)
# --------------------------------------------------------------------------- #

def refine_uv(surface, uv_pts, p3, tris, frozen, tol,
              max_pts=20000, max_passes=12, pinned=None):
    """Split interior edges whose 3-D midpoint chord error exceeds tol.
    Conforming: the split set is global per pass, each triangle re-splits
    by how many of its edges were chosen (1->2, 2->3, 3->4). Edges with an
    endpoint in `pinned` (apex/pole copies that weld to one 3-D point)
    are never split — refined midpoints there would not weld."""
    uv_pts = [np.asarray(p, np.float64) for p in uv_pts]
    p3 = [np.asarray(p, np.float64) for p in p3]
    tris = [tuple(t) for t in tris]
    pinned = pinned or set()
    for _ in range(max_passes):
        if len(uv_pts) >= max_pts:
            break
        edges = set()
        for a, b, c in tris:
            for i, j in ((a, b), (b, c), (c, a)):
                k = (i, j) if i < j else (j, i)
                if k not in frozen and i not in pinned and j not in pinned:
                    edges.add(k)
        if not edges:
            break
        elist = sorted(edges)
        mids_uv = np.array([(uv_pts[i] + uv_pts[j]) / 2 for i, j in elist])
        mids3 = surface.point(mids_uv)
        chord = np.array([(p3[i] + p3[j]) / 2 for i, j in elist])
        err = np.linalg.norm(mids3 - chord, axis=1)
        split = {}
        for k, (e, ev) in enumerate(zip(elist, err)):
            if ev > tol:
                split[e] = len(uv_pts)
                uv_pts.append(mids_uv[k])
                p3.append(mids3[k])
        if not split:
            break
        out = []
        for a, b, c in tris:
            def mid(i, j):
                return split.get((i, j) if i < j else (j, i))
            mab, mbc, mca = mid(a, b), mid(b, c), mid(c, a)
            cnt = sum(x is not None for x in (mab, mbc, mca))
            if cnt == 0:
                out.append((a, b, c))
            elif cnt == 3:
                out.extend([(a, mab, mca), (mab, b, mbc),
                            (mca, mbc, c), (mab, mbc, mca)])
            elif cnt == 1:
                if mab is not None:
                    out.extend([(a, mab, c), (mab, b, c)])
                elif mbc is not None:
                    out.extend([(b, mbc, a), (mbc, c, a)])
                else:
                    out.extend([(c, mca, b), (mca, a, b)])
            else:                                # two edges split
                if mca is None:
                    m1, m2, (x, y, z) = mab, mbc, (a, b, c)
                elif mab is None:
                    m1, m2, (x, y, z) = mbc, mca, (b, c, a)
                else:
                    m1, m2, (x, y, z) = mca, mab, (c, a, b)
                # edges xy and yz split at m1, m2
                out.extend([(x, m1, m2), (m1, y, m2), (x, m2, z)])
        tris = out
    return uv_pts, p3, tris


# --------------------------------------------------------------------------- #
# face tessellation
# --------------------------------------------------------------------------- #

def _loop_polyline(loop, tol):
    """Concatenate the (shared) edge polylines of a loop; closed, the
    final closing duplicate dropped."""
    poly = []
    for e, sense in loop:
        pts = e.polyline(tol)
        if not sense:
            pts = pts[::-1]
        if poly and np.allclose(poly[-1], pts[0], atol=1e-9):
            poly.extend(list(pts[1:]))
        else:
            poly.extend(list(pts))
    if len(poly) > 1 and np.allclose(poly[0], poly[-1], atol=1e-9):
        poly.pop()
    return np.asarray(poly)


def _unwrap_seq(vals, period, deg_mask):
    """Continuity unwrap of a periodic coordinate along a polyline;
    degenerate entries are filled by neighbor interpolation afterward."""
    out = np.asarray(vals, np.float64).copy()
    good = ~deg_mask
    gi = np.flatnonzero(good)
    if gi.size == 0:
        return out
    for a, b in zip(gi[:-1], gi[1:]):
        d = out[b] - out[a]
        out[b] -= period * np.round(d / period)
    # fill degenerate stretches linearly between bracketing good values
    if deg_mask.any():
        n = out.size
        for i in np.flatnonzero(deg_mask):
            prev_g = gi[gi < i]
            next_g = gi[gi > i]
            if prev_g.size and next_g.size:
                a, b = prev_g[-1], next_g[0]
                t = (i - a) / (b - a)
                out[i] = out[a] * (1 - t) + out[b] * t
            elif prev_g.size:
                out[i] = out[prev_g[-1]]
            elif next_g.size:
                out[i] = out[next_g[0]]
        del n
    return out


def _closed_grid(surface, tol):
    """Full-surface tessellation of a closed surface over its natural
    domain (sphere, torus); seams/poles weld downstream."""
    dom = surface.natural_domain()
    if dom is None:
        return np.zeros((0, 3, 3))
    (u0, u1), (v0, v1) = dom
    su, sv = surface.uv_scales()

    def count(length, scale):
        r = max(scale, 1e-9)
        # chord error of sampling an arc of radius r: r(1-cos(h/2r))
        h = 2 * np.arccos(max(1.0 - tol / r, -1.0)) * r
        return int(np.clip(np.ceil(length * scale / max(h, 1e-9)), 16, 256))

    nu = count(u1 - u0, su)
    nv = count(v1 - v0, sv)
    uu = np.linspace(u0, u1, nu + 1)
    vv = np.linspace(v0, v1, nv + 1)
    U, V = np.meshgrid(uu, vv, indexing="ij")
    G = np.stack([U.reshape(-1), V.reshape(-1)], axis=1)
    P = surface.point(G).reshape(nu + 1, nv + 1, 3)
    tris = []
    for i in range(nu):
        for j in range(nv):
            a, b, c, d = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            tris.append([a, b, c])
            tris.append([a, c, d])
    return np.asarray(tris)


def tessellate_face(face: BrepFace, tol: float) -> np.ndarray:
    """Tessellate one face; returns a (T, 3, 3) triangle array."""
    surface = face.surface
    pu, pv = surface.periods

    # split loops into polylines vs degenerate vertex points
    polys3 = []
    degen_pts = []
    for lp in face.loops:
        if isinstance(lp, np.ndarray):
            degen_pts.append(lp)
            continue
        poly = _loop_polyline(lp, tol)
        if poly.shape[0] >= 3:
            polys3.append(poly)
        elif poly.shape[0] > 0:
            degen_pts.append(poly[0])

    if not polys3:
        return _closed_grid(surface, tol)

    su, sv = surface.uv_scales()

    loops_uv = []
    winds = []
    for poly in polys3:
        raw = surface.uv(poly)
        dm = surface.degenerate(poly)
        u = _unwrap_seq(raw[:, 0], pu, dm) if pu else raw[:, 0]
        v = _unwrap_seq(raw[:, 1], pv, dm) if pv else raw[:, 1]

        def _wind(vals, period):
            # net period crossings around the closed loop
            if not period or len(vals) < 2:
                return 0
            closing = vals[0] - vals[-1]
            closing -= period * np.round(closing / period)
            return int(np.round((vals[-1] + closing - vals[0]) / period))

        loops_uv.append(np.stack([u, v], axis=1))
        winds.append((_wind(u, pu), _wind(v, pv)))

    # seam-artifact heuristic: a single loop covering the whole periodic
    # domain of a closed surface (sphere/torus authored with seam edges)
    if pu is not None and surface.natural_domain() is not None and \
            len(loops_uv) == 1 and all(w == (0, 0) for w in winds):
        dom = surface.natural_domain()
        span_u = float(np.ptp(loops_uv[0][:, 0]))
        span_v = float(np.ptp(loops_uv[0][:, 1]))
        if span_u >= 0.999 * (dom[0][1] - dom[0][0]) and \
                span_v >= 0.999 * (dom[1][1] - dom[1][0]):
            return _closed_grid(surface, tol)

    wrapping = [i for i, w in enumerate(winds) if w != (0, 0)]
    simple = [i for i, w in enumerate(winds) if w == (0, 0)]

    pinned = set()
    scale = np.array([su, sv])
    if wrapping and not simple and len(wrapping) <= 2:
        # periodic band with no interior holes: marching-strip stitch
        # between the two boundaries (no long UV edges, so chord
        # refinement stays local)
        strip = _band_strip(face, loops_uv, winds, wrapping, degen_pts)
        if strip is None:
            return np.zeros((0, 3, 3))
        uv_pts, tris_idx, frozen, pinned = strip
        p3 = list(surface.point(np.asarray(uv_pts)))
    else:
        if wrapping:
            polygon = _band_polygon(face, loops_uv, winds, wrapping,
                                    degen_pts, tol)
            holes = [loops_uv[i] for i in simple]
        else:
            # outer = largest |area| in scaled UV
            areas = [abs(signed_area(loops_uv[i] * [su, sv]))
                     for i in simple]
            oi = simple[int(np.argmax(areas))]
            polygon = loops_uv[oi]
            holes = [loops_uv[i] for i in simple if i != oi]

        merged = merge_holes(polygon * scale,
                             [h * scale for h in holes]) / scale

        tris_idx = ear_clip(merged * scale)
        if not tris_idx:
            return np.zeros((0, 3, 3))

        uv_pts = list(merged)
        p3 = list(surface.point(merged))
        npts = len(uv_pts)
        frozen = set()
        for i in range(npts):
            j = (i + 1) % npts
            frozen.add((i, j) if i < j else (j, i))

    uv_pts, p3, tris_idx = refine_uv(surface, uv_pts, p3, tris_idx,
                                     frozen, tol, pinned=pinned)

    P3 = np.asarray(p3)
    UV = np.asarray(uv_pts) * scale
    out = []
    for a, b, c in tris_idx:
        cross = (UV[b, 0] - UV[a, 0]) * (UV[c, 1] - UV[a, 1]) - \
            (UV[b, 1] - UV[a, 1]) * (UV[c, 0] - UV[a, 0])
        tri = [P3[a], P3[b], P3[c]]
        if (cross < 0) == face.same_sense:
            tri = tri[::-1]
        # drop degenerate slivers
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        if np.linalg.norm(n) > 1e-20:
            out.append(tri)
    return np.asarray(out) if out else np.zeros((0, 3, 3))


def _band_orient(loops_uv, i, axis, period):
    """A wrapping loop as an open u-monotone polyline over one period,
    with the closing copy appended one period on."""
    lp = loops_uv[i].copy()
    if lp[-1, axis] < lp[0, axis]:
        lp = lp[::-1]
    first = lp[0].copy()
    first[axis] += period
    return np.vstack([lp, first[None, :]])


def _band_strip(face, loops_uv, winds, wrapping, degen_pts):
    """Marching-strip triangulation of a periodic band between two
    boundaries (second wrapping loop, a degenerate apex/pole, or the
    natural-domain edge). Both rims keep their own shared-edge samples
    (no resampling — watertight against the neighbor faces); the two
    seam ends differ by exactly one period so they weld. Returns
    (uv_pts, tris, frozen boundary edges, pinned apex indices)."""
    surface = face.surface
    w0 = winds[wrapping[0]]
    axis = 0 if w0[0] != 0 else 1
    other = 1 - axis
    period = surface.periods[axis]
    A = _band_orient(loops_uv, wrapping[0], axis, period)
    pinnedB = False
    if len(wrapping) == 2:
        B = _band_orient(loops_uv, wrapping[1], axis, period)
        u = B[:-1, axis]
        u = u - period * np.floor((u - A[0, axis]) / period)
        order = np.argsort(u, kind="stable")
        B2 = np.empty((u.size + 1, 2))
        B2[:-1, axis] = u[order]
        B2[:-1, other] = B[:-1, other][order]
        B2[-1] = B2[0]
        B2[-1, axis] += period
        B = B2
    elif degen_pts:
        vuv = surface.uv(np.asarray(degen_pts[0])[None, :])[0]
        B = A.copy()
        B[:, other] = vuv[other]
        pinnedB = True
    else:
        dom = surface.natural_domain()
        if dom is None:
            return None
        edge_v = dom[other][0] if \
            A[:, other].mean() > sum(dom[other]) / 2 else dom[other][1]
        B = A.copy()
        B[:, other] = edge_v
    # intermediate structured rows: near-square quads avoid the Schwarz-
    # lantern area blow-up that bisecting tall strip triangles produces
    su_sv = surface.uv_scales()
    s_ax, s_ot = su_sv[axis], su_sv[other]
    du_med = float(np.median(np.diff(A[:, axis]))) * max(s_ax, 1e-12)
    height = float(np.max(np.abs(A[:, other].mean() - B[:, other]))
                   + np.ptp(A[:, other])) * max(s_ot, 1e-12)
    K = int(np.clip(np.ceil(height / max(du_med, 1e-12)), 1, 128))
    # common u-grid over exactly one period [a, a+p] so the two seam
    # columns stay one period apart (they weld); B is sampled through a
    # periodic unroll since its own window may be offset
    a = float(A[0, axis])
    ub = B[:-1, axis] - period * np.floor((B[:-1, axis] - a) / period)
    U = np.unique(np.concatenate([A[:-1, axis], ub]))
    U = np.concatenate([U, [a + period]])
    vA = np.interp(U, A[:, axis], A[:, other])
    vB = np.interp(U, np.concatenate([B[:, axis] - period, B[:, axis]]),
                   np.concatenate([B[:, other], B[:, other]]))
    rows = [A]
    for k in range(1, K):
        t = k / K
        row = np.empty((U.size, 2))
        row[:, axis] = U
        row[:, other] = vA * (1 - t) + vB * t
        rows.append(row)
    rows.append(B)

    pts = []
    offs = []
    for row in rows:
        offs.append(len(pts))
        pts.extend(list(row))
    tris = []
    frozen = set()
    for P, Q, op, oq in zip(rows[:-1], rows[1:], offs[:-1], offs[1:]):
        i = j = 0
        nP, nQ = P.shape[0], Q.shape[0]
        while i < nP - 1 or j < nQ - 1:
            if j >= nQ - 1:
                adv_p = True
            elif i >= nP - 1:
                adv_p = False
            else:
                adv_p = P[i + 1, axis] <= Q[j + 1, axis]
            if adv_p:
                tris.append((op + i, op + i + 1, oq + j))
                i += 1
            else:
                tris.append((op + i, oq + j + 1, oq + j))
                j += 1
    # freeze the true boundary rows (shared with neighbor faces) and the
    # seam end columns (their two sides weld by the one-period shift)
    for row, off in ((rows[0], offs[0]), (rows[-1], offs[-1])):
        for k in range(row.shape[0] - 1):
            frozen.add((off + k, off + k + 1))
    for rp, rq, op, oq in zip(rows[:-1], rows[1:], offs[:-1], offs[1:]):
        frozen.add(tuple(sorted((op, oq))))
        frozen.add(tuple(sorted((op + rp.shape[0] - 1,
                                 oq + rq.shape[0] - 1))))
    pinned = set(range(offs[-1], offs[-1] + rows[-1].shape[0])) \
        if pinnedB else set()
    return pts, tris, frozen, pinned


def _band_polygon(face, loops_uv, winds, wrapping, degen_pts, tol):
    """Cut a periodic band along a seam: one wrapping loop runs forward
    over one period, the opposite boundary (second wrapping loop, or a
    degenerate apex/pole point) runs backward, and straight seam bridges
    close the polygon. The two bridge sides differ by exactly one period
    in u so their 3-D images coincide and weld."""
    surface = face.surface
    pu, _pv = surface.periods
    axis = 0 if winds[wrapping[0]][0] != 0 else 1
    period = pu if axis == 0 else surface.periods[1]

    A = _band_orient(loops_uv, wrapping[0], axis, period)
    other = 1 - axis
    if len(wrapping) >= 2:
        B = _band_orient(loops_uv, wrapping[1], axis, period)
        # shift B onto A's period window
        shift = np.round((A[0, axis] - B[0, axis]) / period) * period
        B = B.copy()
        B[:, axis] += shift
    elif degen_pts:
        p = degen_pts[0]
        vuv = surface.uv(p[None, :])[0]
        B0 = np.zeros((2, 2))
        B0[0, axis] = A[0, axis]
        B0[1, axis] = A[0, axis] + period
        B0[0, other] = vuv[other]
        B0[1, other] = vuv[other]
        B = B0
    else:
        # half-open band on a surface bounded in v: close at the natural
        # domain edge
        dom = surface.natural_domain()
        if dom is None:
            return loops_uv[wrapping[0]]
        edge_v = dom[other][0] if \
            loops_uv[wrapping[0]][:, other].mean() > sum(dom[other]) / 2 \
            else dom[other][1]
        B0 = np.zeros((2, 2))
        B0[0, axis] = A[0, axis]
        B0[1, axis] = A[0, axis] + period
        B0[0, other] = edge_v
        B0[1, other] = edge_v
        B = B0

    # seam bridges: identical samples shifted by one period so both
    # sides weld; sample count from the surface scale across the seam
    sv_scale = surface.uv_scales()[other]
    seam_len = abs(A[-1, other] - B[-1, other]) * max(sv_scale, 1e-9)
    nseam = int(np.clip(np.ceil(seam_len / max(tol * 8, 1e-9)), 1, 64))
    t = np.linspace(0.0, 1.0, nseam + 1)[1:-1]
    hi_seam = A[-1] + (B[-1] - A[-1]) * t[:, None]      # at u0 + period
    lo_seam = hi_seam.copy()
    lo_seam[:, axis] -= period                          # at u0, same 3-D

    polygon = np.vstack([
        A,                        # forward along the band, u0 -> u0+period
        hi_seam,                  # down the seam at u0+period
        B[::-1],                  # backward along the far boundary
        lo_seam[::-1],            # up the seam at u0
    ])
    return polygon
