"""Programmatic Part-21 (STEP) fixtures for the B-rep importer tests.

Each generator emits a minimal, valid-enough AP214-style DATA section
covering one region of the supported subset (analytic quadrics, B-spline
patches, fillet + bore topology). Fixtures author each EDGE_CURVE once and
reference it from both adjacent faces, like real exporters do — that is
what the importer's shared-edge discretization contract relies on."""

import numpy as np


class StepWriter:
    def __init__(self):
        self.lines = []
        self.n = 0

    def add(self, typ, args):
        self.n += 1
        self.lines.append(f"#{self.n}={typ}({args});")
        return self.n

    # -- geometry ---------------------------------------------------------- #

    def cart(self, p):
        return self.add("CARTESIAN_POINT",
                        f"'',({p[0]:.12g},{p[1]:.12g},{p[2]:.12g})")

    def dirn(self, d):
        return self.add("DIRECTION",
                        f"'',({d[0]:.12g},{d[1]:.12g},{d[2]:.12g})")

    def ax2(self, o, z=(0, 0, 1), x=(1, 0, 0)):
        return self.add(
            "AXIS2_PLACEMENT_3D",
            f"'',#{self.cart(o)},#{self.dirn(z)},#{self.dirn(x)}")

    def vertex(self, p):
        return self.add("VERTEX_POINT", f"'',#{self.cart(p)}")

    def line(self, p, d):
        v = self.add("VECTOR", f"'',#{self.dirn(d)},1.")
        return self.add("LINE", f"'',#{self.cart(p)},#{v}")

    def circle(self, o, r, z=(0, 0, 1), x=(1, 0, 0)):
        return self.add("CIRCLE", f"'',#{self.ax2(o, z, x)},{r:.12g}")

    # -- topology ---------------------------------------------------------- #

    def edge(self, v0, v1, curve, same_sense=True):
        s = ".T." if same_sense else ".F."
        return self.add("EDGE_CURVE", f"'',#{v0},#{v1},#{curve},{s}")

    def oriented(self, edge, sense=True):
        s = ".T." if sense else ".F."
        return self.add("ORIENTED_EDGE", f"'',*,*,#{edge},{s}")

    def loop(self, oriented_edges):
        refs = ",".join(f"#{e}" for e in oriented_edges)
        return self.add("EDGE_LOOP", f"'',({refs})")

    def vertex_loop(self, vertex):
        return self.add("VERTEX_LOOP", f"'',#{vertex}")

    def bound(self, loop, outer=False, sense=True):
        t = "FACE_OUTER_BOUND" if outer else "FACE_BOUND"
        s = ".T." if sense else ".F."
        return self.add(t, f"'',#{loop},{s}")

    def face(self, bounds, surface, same_sense=True):
        refs = ",".join(f"#{b}" for b in bounds)
        s = ".T." if same_sense else ".F."
        return self.add("ADVANCED_FACE", f"'',({refs}),#{surface},{s}")

    # -- surfaces ---------------------------------------------------------- #

    def plane(self, o, z=(0, 0, 1), x=(1, 0, 0)):
        return self.add("PLANE", f"'',#{self.ax2(o, z, x)}")

    def cylinder(self, o, r, z=(0, 0, 1), x=(1, 0, 0)):
        return self.add("CYLINDRICAL_SURFACE",
                        f"'',#{self.ax2(o, z, x)},{r:.12g}")

    def cone(self, o, r, semi_angle, z=(0, 0, 1), x=(1, 0, 0)):
        return self.add(
            "CONICAL_SURFACE",
            f"'',#{self.ax2(o, z, x)},{r:.12g},{semi_angle:.12g}")

    def sphere(self, o, r):
        return self.add("SPHERICAL_SURFACE", f"'',#{self.ax2(o)},{r:.12g}")

    def torus(self, o, R, r):
        return self.add("TOROIDAL_SURFACE",
                        f"'',#{self.ax2(o)},{R:.12g},{r:.12g}")

    def text(self):
        return ("ISO-10303-21;\nHEADER;\nENDSEC;\nDATA;\n"
                + "\n".join(self.lines)
                + "\nENDSEC;\nEND-ISO-10303-21;")

    # -- composite helpers ------------------------------------------------- #

    def full_circle_edge(self, o, r, z=(0, 0, 1), x=(1, 0, 0)):
        """A closed circular edge: one vertex used as both ends."""
        o = np.asarray(o, float)
        x = np.asarray(x, float)
        p = o + r * x
        v = self.vertex(p)
        return self.edge(v, v, self.circle(o, r, z, x))

    def polyline_edges(self, pts, close=True):
        """Straight edges through pts (shared vertices); returns edge ids."""
        vs = [self.vertex(p) for p in pts]
        edges = []
        rng = range(len(pts)) if close else range(len(pts) - 1)
        for i in rng:
            j = (i + 1) % len(pts)
            d = np.asarray(pts[j], float) - np.asarray(pts[i], float)
            d = d / np.linalg.norm(d)
            edges.append(self.edge(vs[i], vs[j], self.line(pts[i], d)))
        return edges, vs


def can_step(r=1.0, h=2.0):
    """Cylinder side band + two planar caps."""
    w = StepWriter()
    e_bot = w.full_circle_edge((0, 0, 0), r)
    e_top = w.full_circle_edge((0, 0, h), r)
    wall = w.face([w.bound(w.loop([w.oriented(e_bot)]), outer=True),
                   w.bound(w.loop([w.oriented(e_top)]))],
                  w.cylinder((0, 0, 0), r))
    cap_b = w.face([w.bound(w.loop([w.oriented(e_bot, False)]), outer=True)],
                   w.plane((0, 0, 0)), same_sense=False)
    cap_t = w.face([w.bound(w.loop([w.oriented(e_top)]), outer=True)],
                   w.plane((0, 0, h)))
    del wall, cap_b, cap_t
    return w.text()


def cone_step(r=1.0, semi_angle=0.4636476090008061):
    """Full cone from base circle to apex (vertex loop)."""
    w = StepWriter()
    e_base = w.full_circle_edge((0, 0, 0), r)
    apex_z = -r / np.tan(semi_angle)
    av = w.vertex((0, 0, apex_z))
    w.face([w.bound(w.loop([w.oriented(e_base)]), outer=True),
            w.bound(w.vertex_loop(av))],
           w.cone((0, 0, 0), r, semi_angle))
    w.face([w.bound(w.loop([w.oriented(e_base, False)]), outer=True)],
           w.plane((0, 0, 0)), same_sense=False)
    return w.text()


def sphere_step(r=1.0):
    w = StepWriter()
    w.face([], w.sphere((0, 0, 0), r))
    return w.text()


def torus_step(R=2.0, r=0.5):
    w = StepWriter()
    w.face([], w.torus((0, 0, 0), R, r))
    return w.text()


def plate_bore_step(L=2.0, W=1.5, T=0.4, r=0.3):
    """Rectangular plate with a through bore: planar faces with circular
    holes + an interior cylindrical bore wall."""
    w = StepWriter()
    c = (L / 2, W / 2)
    # outer rectangle edges, bottom (z=0) and top (z=T)
    bot = [(0, 0, 0), (L, 0, 0), (L, W, 0), (0, W, 0)]
    top = [(0, 0, T), (L, 0, T), (L, W, T), (0, W, T)]
    eb, vb = w.polyline_edges(bot)
    et, vt = w.polyline_edges(top)
    # vertical edges
    ev = []
    for i in range(4):
        d = (0, 0, 1)
        ev.append(w.edge(vb[i], vt[i], w.line(bot[i], d)))
    # bore rims
    e_hb = w.full_circle_edge((c[0], c[1], 0), r)
    e_ht = w.full_circle_edge((c[0], c[1], T), r)
    # bottom face (normal -z): outer rect + hole
    w.face([w.bound(w.loop([w.oriented(e, False) for e in eb[::-1]]),
                    outer=True),
            w.bound(w.loop([w.oriented(e_hb)]))],
           w.plane((0, 0, 0)), same_sense=False)
    # top face (+z)
    w.face([w.bound(w.loop([w.oriented(e) for e in et]), outer=True),
            w.bound(w.loop([w.oriented(e_ht, False)]))],
           w.plane((0, 0, T)))
    # four side faces
    for i in range(4):
        j = (i + 1) % 4
        lp = w.loop([w.oriented(eb[i]), w.oriented(ev[j]),
                     w.oriented(et[i], False), w.oriented(ev[i], False)])
        n = np.cross(np.asarray(bot[j]) - np.asarray(bot[i]), (0, 0, 1))
        n = n / np.linalg.norm(n)
        w.face([w.bound(lp, outer=True)],
               w.plane(bot[i], z=tuple(n),
                       x=tuple((np.asarray(bot[j]) - np.asarray(bot[i]))
                               / np.linalg.norm(np.asarray(bot[j])
                                                - np.asarray(bot[i])))))
    # bore wall (normal points into the bore axis => same_sense=False for
    # an outward-oriented solid)
    w.face([w.bound(w.loop([w.oriented(e_hb)]), outer=True),
            w.bound(w.loop([w.oriented(e_ht)]))],
           w.cylinder((c[0], c[1], 0), r), same_sense=False)
    return w.text()


def bspline_box_step(a=2.0, bulge=0.8):
    """Box with the top face replaced by a quadratic B-spline patch bulged
    at the centre; patch boundary = the four straight top edges."""
    w = StepWriter()
    h = 1.0
    bot = [(0, 0, 0), (a, 0, 0), (a, a, 0), (0, a, 0)]
    top = [(0, 0, h), (a, 0, h), (a, a, h), (0, a, h)]
    eb, vb = w.polyline_edges(bot)
    et, vt = w.polyline_edges(top)
    ev = [w.edge(vb[i], vt[i], w.line(bot[i], (0, 0, 1))) for i in range(4)]
    w.face([w.bound(w.loop([w.oriented(e, False) for e in eb[::-1]]),
                    outer=True)],
           w.plane((0, 0, 0)), same_sense=False)
    for i in range(4):
        j = (i + 1) % 4
        lp = w.loop([w.oriented(eb[i]), w.oriented(ev[j]),
                     w.oriented(et[i], False), w.oriented(ev[i], False)])
        n = np.cross(np.asarray(bot[j]) - np.asarray(bot[i]), (0, 0, 1))
        n = n / np.linalg.norm(n)
        w.face([w.bound(lp, outer=True)],
               w.plane(bot[i], z=tuple(n),
                       x=tuple((np.asarray(bot[j]) - np.asarray(bot[i]))
                               / np.linalg.norm(np.asarray(bot[j])
                                                - np.asarray(bot[i])))))
    # B-spline top: 3x3 control net; u along x, v along y; boundary rows
    # collinear (straight edges), centre raised
    rows = []
    for i, xc in enumerate((0.0, a / 2, a)):
        row = []
        for j, yc in enumerate((0.0, a / 2, a)):
            z = h + (bulge if (i == 1 and j == 1) else 0.0)
            row.append(f"#{w.cart((xc, yc, z))}")
        rows.append("(" + ",".join(row) + ")")
    surf = w.add(
        "B_SPLINE_SURFACE_WITH_KNOTS",
        "'',2,2,(" + ",".join(rows) + "),.UNSPECIFIED.,.F.,.F.,.F.,"
        "(3,3),(3,3),(0.,1.),(0.,1.),.UNSPECIFIED.")
    lp = w.loop([w.oriented(e) for e in et])
    w.face([w.bound(lp, outer=True)], surf)
    return w.text()


def fillet_bore_step(L=2.0, W=1.0, H=1.0, rho=0.3, rb=0.15):
    """Block with a quarter-round fillet along the top-front edge and a
    vertical through bore — the importer acceptance part (fillet + bore,
    watertight, faces addressable by ID)."""
    w = StepWriter()
    cb = (L * 0.75, W * 0.5)          # bore centre (clear of the fillet)
    # profile in (y, z) for the end faces, x = 0 and x = L:
    #   (0,0) -> (W,0) -> (W,H) -> (rho,H) -> arc -> (0,H-rho) -> close
    arc_c = (rho, H - rho)

    def prof(x):
        return [(x, 0, 0), (x, W, 0), (x, W, H), (x, rho, H),
                (x, 0, H - rho)]

    p0 = prof(0.0)
    p1 = prof(L)
    v0 = [w.vertex(p) for p in p0]
    v1 = [w.vertex(p) for p in p1]

    def seg(va, vb, pa, pb):
        d = np.asarray(pb, float) - np.asarray(pa, float)
        d = d / np.linalg.norm(d)
        return w.edge(va, vb, w.line(pa, tuple(d)))

    # end-face straight edges (0-1, 1-2, 2-3 straight; 3-4 arc; 4-0 straight)
    e0 = [seg(v0[i], v0[i + 1], p0[i], p0[i + 1]) for i in range(3)]
    e1 = [seg(v1[i], v1[i + 1], p1[i], p1[i + 1]) for i in range(3)]
    # fillet arcs at x=0 and x=L: circle with axis +x centred at arc_c
    # local frame: z-axis = (1,0,0); x-axis = (0,0,1) so that the quarter
    # from (y=rho-> angle) works out; parametrize and check in the test
    arc0 = w.circle((0, arc_c[0], arc_c[1]), rho, z=(1, 0, 0), x=(0, 0, 1))
    arc1 = w.circle((L, arc_c[0], arc_c[1]), rho, z=(1, 0, 0), x=(0, 0, 1))
    ea0 = w.edge(v0[3], v0[4], arc0)
    ea1 = w.edge(v1[3], v1[4], arc1)
    e0c = seg(v0[4], v0[0], p0[4], p0[0])
    e1c = seg(v1[4], v1[0], p1[4], p1[0])
    # lateral edges along x between matching profile vertices
    el = [w.edge(v0[i], v1[i], w.line(p0[i], (1, 0, 0))) for i in range(5)]

    # end faces (x=0 normal -x, x=L normal +x)
    lp0 = w.loop([w.oriented(e0[0]), w.oriented(e0[1]), w.oriented(e0[2]),
                  w.oriented(ea0), w.oriented(e0c)])
    w.face([w.bound(lp0, outer=True)],
           w.plane((0, 0, 0), z=(-1, 0, 0), x=(0, 0, 1)))
    lp1 = w.loop([w.oriented(e1[0]), w.oriented(e1[1]), w.oriented(e1[2]),
                  w.oriented(ea1), w.oriented(e1c)])
    w.face([w.bound(lp1, outer=True)],
           w.plane((L, 0, 0), z=(1, 0, 0), x=(0, 1, 0)))

    def quad(ea, eb_, ec, ed, plane, holes=()):
        lp = w.loop([w.oriented(ea), w.oriented(eb_), w.oriented(ec, False),
                     w.oriented(ed, False)])
        bounds = [w.bound(lp, outer=True)] + list(holes)
        return w.face(bounds, plane)

    # bore rims
    e_hb = w.full_circle_edge((cb[0], cb[1], 0), rb)
    e_ht = w.full_circle_edge((cb[0], cb[1], H), rb)
    # bottom z=0 with the bore hole
    quad(e0[0], el[1], e1[0], el[0],
         w.plane((0, 0, 0), z=(0, 0, -1), x=(1, 0, 0)),
         holes=[w.bound(w.loop([w.oriented(e_hb)]))])
    # back y=W
    quad(e0[1], el[2], e1[1], el[1],
         w.plane((0, W, 0), z=(0, 1, 0), x=(1, 0, 0)))
    # front y=0 (z in [0, H-rho]): edges e0c/e1c and laterals 4,0
    quad(e0c, el[0], e1c, el[4],
         w.plane((0, 0, 0), z=(0, -1, 0), x=(1, 0, 0)))
    # fillet quarter-cylinder: axis along +x at (y=rho, z=H-rho)
    lpf = w.loop([w.oriented(ea0), w.oriented(el[4]),
                  w.oriented(ea1, False), w.oriented(el[3], False)])
    w.face([w.bound(lpf, outer=True)],
           w.cylinder((0, arc_c[0], arc_c[1]), rho,
                      z=(1, 0, 0), x=(0, 0, 1)))
    # top z=H (y in [rho, W]) with the bore hole
    lpt = w.loop([w.oriented(e0[2]), w.oriented(el[3]),
                  w.oriented(e1[2], False), w.oriented(el[2], False)])
    w.face([w.bound(lpt, outer=True),
            w.bound(w.loop([w.oriented(e_ht, False)]))],
           w.plane((0, 0, H), z=(0, 0, 1), x=(1, 0, 0)))
    # bore wall
    w.face([w.bound(w.loop([w.oriented(e_hb)]), outer=True),
            w.bound(w.loop([w.oriented(e_ht)]))],
           w.cylinder((cb[0], cb[1], 0), rb), same_sense=False)
    return w.text()
