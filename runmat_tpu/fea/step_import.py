"""STEP (ISO-10303-21) subset importer: tessellated B-rep shells from
analytic surfaces.

Reference parity: runmat-geometry/io/src/{occt,cad,import} — the reference
links OCCT for full STEP; this TPU-build subset parses Part-21 files
directly (pure python, no FFI) and tessellates the analytic-surface subset
that covers prismatic engineering parts:

  * ADVANCED_FACE over PLANE with straight (LINE) and circular (CIRCLE)
    edge loops — polygon faces, arcs sampled;
  * CYLINDRICAL_SURFACE side walls bounded by two circular edges — lateral
    quad strips.

Output is a welded triangle shell (vertices, faces) feeding the same
surface-bounded meshing pipeline as OBJ/PLY/STL imports.
"""

from __future__ import annotations

import re

import numpy as np

from ..errors import MatError

_ENT = re.compile(r"#(\d+)\s*=\s*([A-Z0-9_]+)\s*\((.*)\)\s*$", re.S)


def _split_args(s: str) -> list:
    """Split a Part-21 argument list at top-level commas."""
    out, depth, cur, in_str = [], 0, [], False
    for ch in s:
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _parse(text: str) -> dict:
    """#id -> (TYPE, [raw args])."""
    body = text
    m = re.search(r"DATA\s*;(.*)ENDSEC\s*;", text, re.S)
    if m:
        body = m.group(1)
    ents = {}
    for stmt in body.split(";"):
        em = _ENT.match(stmt.strip())
        if em:
            ents[int(em.group(1))] = (em.group(2), _split_args(em.group(3)))
    if not ents:
        raise MatError("RunMat:step:BadFile",
                       "No Part-21 entities found in STEP data section.")
    return ents


def _ref(tok: str) -> int:
    return int(tok.strip().lstrip("#"))


def _refs(tok: str) -> list:
    return [int(t) for t in re.findall(r"#(\d+)", tok)]


class _Step:
    def __init__(self, ents: dict):
        self.e = ents
        self.unsupported: set = set()

    def point(self, i: int) -> np.ndarray:
        t, a = self.e[i]
        if t == "VERTEX_POINT":
            return self.point(_ref(a[1]))
        if t != "CARTESIAN_POINT":
            raise MatError("RunMat:step:BadRef", f"#{i} is {t}, not a point")
        nums = re.findall(r"[-+0-9.Ee]+", a[1])
        v = [float(x) for x in nums[:3]]
        while len(v) < 3:
            v.append(0.0)
        return np.array(v)

    def direction(self, i: int) -> np.ndarray:
        t, a = self.e[i]
        nums = re.findall(r"[-+0-9.Ee]+", a[1])
        v = np.array([float(x) for x in (nums + ["0", "0", "0"])[:3]])
        n = np.linalg.norm(v)
        return v / (n or 1.0)

    def placement(self, i: int):
        """AXIS2_PLACEMENT_3D -> (origin, z, x)."""
        t, a = self.e[i]
        origin = self.point(_ref(a[1]))
        z = self.direction(_ref(a[2])) if len(a) > 2 and "#" in a[2] \
            else np.array([0.0, 0.0, 1.0])
        x = self.direction(_ref(a[3])) if len(a) > 3 and "#" in a[3] \
            else _any_perp(z)
        return origin, z, x

    # -- edges ---------------------------------------------------------------

    def edge_points(self, edge_id: int, sense: bool, arc_n: int = 16):
        """Polyline of an EDGE_CURVE from start to end (honoring sense)."""
        t, a = self.e[edge_id]
        assert t == "EDGE_CURVE", t
        p0 = self.point(_ref(a[1]))
        p1 = self.point(_ref(a[2]))
        curve = _ref(a[3])
        same_sense = a[4].strip() == ".T."
        ct, ca = self.e[curve]
        if ct == "LINE":
            pts = [p0, p1]
        elif ct == "CIRCLE":
            origin, z, x = self.placement(_ref(ca[1]))
            r = float(re.findall(r"[-+0-9.Ee]+", ca[2])[0])
            y = np.cross(z, x)

            def ang(p):
                d = p - origin
                return np.arctan2(d @ y, d @ x)

            a0, a1 = ang(p0), ang(p1)
            if np.allclose(p0, p1):            # full circle
                a1 = a0 + 2 * np.pi
            else:
                if not same_sense:
                    a0, a1 = a1, a0
                if a1 <= a0:
                    a1 += 2 * np.pi
            ts = np.linspace(a0, a1, arc_n)
            pts = [origin + r * (np.cos(t_) * x + np.sin(t_) * y)
                   for t_ in ts]
            if not same_sense:
                pts = pts[::-1]
            pts[0], pts[-1] = p0, p1           # exact endpoints
        else:
            self.unsupported.add(ct)
            pts = [p0, p1]
        if not sense:
            pts = pts[::-1]
        return pts

    def loop_polygon(self, loop_id: int) -> np.ndarray:
        """EDGE_LOOP -> ordered polygon vertices (last != first)."""
        t, a = self.e[loop_id]
        assert t == "EDGE_LOOP", t
        poly: list = []
        for oe in _refs(a[1]):
            ot, oa = self.e[oe]
            assert ot == "ORIENTED_EDGE", ot
            edge = _ref(oa[3])
            sense = oa[4].strip() == ".T."
            pts = self.edge_points(edge, sense)
            if poly and np.allclose(poly[-1], pts[0], atol=1e-9):
                poly.extend(pts[1:])
            else:
                poly.extend(pts)
        # drop the closing duplicate
        if len(poly) > 1 and np.allclose(poly[0], poly[-1], atol=1e-9):
            poly.pop()
        return np.array(poly)


def _any_perp(z: np.ndarray) -> np.ndarray:
    v = np.array([1.0, 0.0, 0.0])
    if abs(z @ v) > 0.9:
        v = np.array([0.0, 1.0, 0.0])
    v = v - (v @ z) * z
    return v / np.linalg.norm(v)


def _ear_clip(poly2: np.ndarray) -> list:
    """Triangulate a simple polygon (2-D, either winding) by ear clipping."""
    n = poly2.shape[0]
    idx = list(range(n))
    # ensure CCW
    area2 = 0.0
    for i in range(n):
        x1, y1 = poly2[i]
        x2, y2 = poly2[(i + 1) % n]
        area2 += x1 * y2 - x2 * y1
    if area2 < 0:
        idx.reverse()
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 10 * n:
        guard += 1
        found = False
        m = len(idx)
        for k in range(m):
            a, b, c = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            pa, pb, pc = poly2[a], poly2[b], poly2[c]
            cross = (pb[0] - pa[0]) * (pc[1] - pa[1]) - \
                (pb[1] - pa[1]) * (pc[0] - pa[0])
            if cross <= 1e-14:
                continue                       # reflex or degenerate
            # no other vertex inside OR ON the ear (a reflex vertex sitting
            # exactly on the ear's hypotenuse must block it — the L-shape
            # notch case)
            ok = True
            for j in idx:
                if j in (a, b, c):
                    continue
                p = poly2[j]
                d1 = (pb[0] - pa[0]) * (p[1] - pa[1]) - (pb[1] - pa[1]) * (p[0] - pa[0])
                d2 = (pc[0] - pb[0]) * (p[1] - pb[1]) - (pc[1] - pb[1]) * (p[0] - pb[0])
                d3 = (pa[0] - pc[0]) * (p[1] - pc[1]) - (pa[1] - pc[1]) * (p[0] - pc[0])
                if d1 >= -1e-12 and d2 >= -1e-12 and d3 >= -1e-12:
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
    elif len(idx) > 3:       # numerically stuck: fan the remainder
        for k in range(1, len(idx) - 1):
            tris.append((idx[0], idx[k], idx[k + 1]))
    return tris


def load_step(text: str, arc_n: int = 16):
    """Parse + tessellate a STEP file. Returns (vertices, faces) triangle
    shell (welded). Raises RunMat:step:Unsupported listing surface types
    outside the subset."""
    from .surface import weld_vertices
    ents = _parse(text)
    st = _Step(ents)
    tris: list = []
    unsupported: set = set()
    for i, (t, a) in ents.items():
        if t != "ADVANCED_FACE":
            continue
        bounds = _refs(a[1])
        surf = _ref(a[2])
        same_sense = a[3].strip() == ".T."
        stype, sa = ents[surf]
        loops = []
        for b in bounds:
            bt, ba = ents[b]
            if bt in ("FACE_OUTER_BOUND", "FACE_BOUND"):
                loops.append((bt, _ref(ba[1]), ba[2].strip() == ".T."))
        if stype == "PLANE":
            outer = [lp for lp in loops if lp[0] == "FACE_OUTER_BOUND"] \
                or loops[:1]
            poly = st.loop_polygon(outer[0][1])
            if poly.shape[0] < 3:
                continue
            origin, z, x = st.placement(_ref(sa[1]))
            y = np.cross(z, x)
            p2 = np.stack([(poly - origin) @ x, (poly - origin) @ y], axis=1)
            for (ia, ib, ic) in _ear_clip(p2):
                tri = np.array([poly[ia], poly[ib], poly[ic]])
                if not same_sense:
                    tri = tri[::-1]
                tris.append(tri)
        elif stype == "CYLINDRICAL_SURFACE":
            # side wall bounded by two circular rims: sample both rims and
            # stitch a quad strip
            rims = []
            for _, lp, _s in loops[:2]:
                rims.append(st.loop_polygon(lp))
            if len(rims) == 2 and rims[0].shape[0] >= 3:
                n = min(rims[0].shape[0], rims[1].shape[0])
                r0, r1 = rims[0][:n], rims[1][:n]
                # align rims by nearest starting vertex
                k = int(np.argmin(np.linalg.norm(r1 - r0[0], axis=1)))
                r1 = np.roll(r1, -k, axis=0)
                if np.linalg.norm(r1[1] - r0[1]) > \
                        np.linalg.norm(r1[-1] - r0[1]):
                    r1 = np.roll(r1[::-1], 1, axis=0)
                for j in range(n):
                    j2 = (j + 1) % n
                    tris.append(np.array([r0[j], r0[j2], r1[j]]))
                    tris.append(np.array([r1[j], r0[j2], r1[j2]]))
            else:
                unsupported.add("CYLINDRICAL_SURFACE(bounds)")
        else:
            unsupported.add(stype)
    unsupported |= st.unsupported
    if not tris:
        raise MatError(
            "RunMat:step:Unsupported",
            "No faces in the supported STEP subset (PLANE, "
            "CYLINDRICAL_SURFACE); found: "
            + (", ".join(sorted(unsupported)) or "nothing"))
    if unsupported:
        import sys
        print("runmat-tpu: step import skipped unsupported surfaces: "
              + ", ".join(sorted(unsupported)), file=sys.stderr)
    flat = np.vstack(tris)
    return weld_vertices(flat.reshape(-1, 3, 3))
