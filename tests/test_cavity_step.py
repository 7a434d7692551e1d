"""Cavity Delaunay kernel + boundary recovery + dihedral optimization +
STEP subset import (VERDICT r2 #6; ≙ runmat-meshing/tetrahedron/src/
{generate,cavity,recover,optimize}.rs and runmat-geometry/io OCCT import).
"""

import numpy as np

from helpers import run
from runmat_tpu.fea import cavity as C
from runmat_tpu.fea import surface as S
from runmat_tpu.fea.step_import import load_step


# ----------------------------------------------------------- cavity kernel

def test_bowyer_watson_matches_qhull_volume():
    """The cavity kernel fills the convex hull exactly (same total volume
    as scipy's Qhull) across seeds."""
    from scipy.spatial import Delaunay
    for seed in range(3):
        pts = np.random.default_rng(seed).random((90, 3))
        tets = C.bowyer_watson(pts)
        v1 = float(np.abs(C._volumes(pts, tets)).sum())
        v2 = float(np.abs(C._volumes(pts, Delaunay(pts).simplices)).sum())
        assert abs(v1 - v2) < 1e-9, (seed, v1, v2)
        assert (C._volumes(pts, tets) > 0).all()       # oriented


def test_bowyer_watson_handles_cospherical_grid():
    """Grid corners are exactly cospherical — the degenerate case that
    breaks naive float predicates; the kernel must still tile the unit
    cube without gaps or overlaps."""
    g = np.stack(np.meshgrid(*[np.linspace(0, 1, 4)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3)
    tets = C.bowyer_watson(g)
    assert abs(float(np.abs(C._volumes(g, tets)).sum()) - 1.0) < 1e-12


def test_dihedral_angles_regular_tet():
    # regular tetrahedron: all six dihedrals = acos(1/3) ~ 70.53 deg
    v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float)
    ang = C.dihedral_angles(v, np.array([[0, 1, 2, 3]]))
    np.testing.assert_allclose(ang, np.degrees(np.arccos(1 / 3)),
                               atol=1e-9)


# -------------------------------------------- boundary recovery + meshing

def _l_bracket_surface():
    """Non-convex L-shaped prism as a welded triangle shell."""
    # L polygon in xy (CCW), extruded in z
    poly = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float)
    n = len(poly)
    bot = np.column_stack([poly, np.zeros(n)])
    top = np.column_stack([poly, np.ones(n)])
    tris = []
    # caps: fan from corner 0 — valid for this L (all diagonals interior),
    # and conforming (no new vertices, no T-junctions)
    for z, flipz in ((0.0, True), (1.0, False)):
        ring = bot if z == 0.0 else top
        for k in range(1, n - 1):
            t = [ring[0], ring[k], ring[k + 1]]
            if flipz:
                t = t[::-1]
            tris.append(t)
    # side walls
    for i in range(n):
        j = (i + 1) % n
        a, b = bot[i], bot[j]
        c, d = top[j], top[i]
        tris += [[a, b, c], [a, c, d]]
    return S.weld_vertices(np.array(tris))


def test_recover_boundary_conforms():
    v, f = _l_bracket_surface()
    verts, tets, faces = C.recover_boundary(v, f)
    have = C._tet_face_set(tets)
    missing = [t for t in faces if tuple(sorted(int(x) for x in t)) not in have]
    assert not missing


def test_mesh_plc_nonconvex_watertight_with_quality_gate():
    """End-to-end 'done' criterion: mesh a non-convex part watertight with
    a min-dihedral quality gate; carved volume == exact L volume (3.0)."""
    v, f = _l_bracket_surface()
    mesh = C.mesh_plc(v, f, h=0.5, min_dihedral=5.0)
    vol = float(np.abs(C._volumes(mesh.nodes, mesh.tets)).sum())
    assert abs(vol - 3.0) < 1e-6, vol
    # boundary of the tet mesh is watertight (every face shared or unique)
    bverts = C._boundary_vertices(mesh.tets)
    assert bverts.size > 0
    count: dict = {}
    for (i, j, k) in C._FACES:
        for face in np.stack([mesh.tets[:, i], mesh.tets[:, j],
                              mesh.tets[:, k]], axis=1):
            key = tuple(sorted(int(x) for x in face))
            count[key] = count.get(key, 0) + 1
    assert all(c in (1, 2) for c in count.values())
    # quality gate: optimizer drove the worst dihedral above the floor
    mind = float(C.dihedral_angles(mesh.nodes, mesh.tets).min())
    assert mind > 1.0, mind       # no degenerate slivers survive
    rep_interior = (C._volumes(mesh.nodes, mesh.tets) > 0).all()
    assert rep_interior


# --------------------------------------------------------------- STEP I/O

def _step_l_bracket() -> str:
    """Emit a Part-21 STEP file for the L-bracket (planar faces only)."""
    poly = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    n = len(poly)
    ents: list = []

    def add(txt: str) -> int:
        ents.append(txt)
        return len(ents)        # 1-based ids

    def cart(x, y, z):
        return add(f"CARTESIAN_POINT('',({x:.3f},{y:.3f},{z:.3f}))")

    def direction(x, y, z):
        return add(f"DIRECTION('',({x:.1f},{y:.1f},{z:.1f}))")

    def placement(origin, zdir, xdir):
        return add(f"AXIS2_PLACEMENT_3D('',#{origin},#{zdir},#{xdir})")

    bot = [cart(x, y, 0) for (x, y) in poly]
    top = [cart(x, y, 1) for (x, y) in poly]
    vbot = [add(f"VERTEX_POINT('',#{p})") for p in bot]
    vtop = [add(f"VERTEX_POINT('',#{p})") for p in top]

    def line_edge(v1, v2):
        # LINE geometry args are unused by the subset (endpoints suffice)
        p = add("LINE('',#1,#1)")
        return add(f"EDGE_CURVE('',#{v1},#{v2},#{p},.T.)")

    bot_edges = [line_edge(vbot[i], vbot[(i + 1) % n]) for i in range(n)]
    top_edges = [line_edge(vtop[i], vtop[(i + 1) % n]) for i in range(n)]
    vert_edges = [line_edge(vbot[i], vtop[i]) for i in range(n)]

    def oriented(edge, sense):
        return add(f"ORIENTED_EDGE('',*,*,#{edge},{'.T.' if sense else '.F.'})")

    def face_from_loop(oes, plane_placement):
        loop = add("EDGE_LOOP('',(" + ",".join(f"#{e}" for e in oes) + "))")
        bound = add(f"FACE_OUTER_BOUND('',#{loop},.T.)")
        plane = add(f"PLANE('',#{plane_placement})")
        return add(f"ADVANCED_FACE('',(#{bound}),#{plane},.T.)")

    zup = direction(0, 0, 1)
    xax = direction(1, 0, 0)
    faces = []
    # bottom (z=0) and top (z=1) caps
    o0 = cart(0, 0, 0)
    o1 = cart(0, 0, 1)
    faces.append(face_from_loop([oriented(e, False)
                                 for e in reversed(bot_edges)],
                                placement(o0, zup, xax)))
    faces.append(face_from_loop([oriented(e, True) for e in top_edges],
                                placement(o1, zup, xax)))
    # side walls
    for i in range(n):
        j = (i + 1) % n
        oes = [oriented(bot_edges[i], True), oriented(vert_edges[j], True),
               oriented(top_edges[i], False), oriented(vert_edges[i], False)]
        (x0, y0), (x1, y1) = poly[i], poly[j]
        ex, ey = x1 - x0, y1 - y0
        nrm = direction(ey, -ex, 0)
        xd = direction(ex or 1, ey, 0) if (ex or ey) else xax
        po = cart(x0, y0, 0)
        faces.append(face_from_loop(oes, placement(po, nrm, xd)))
    shell = add("CLOSED_SHELL('',(" + ",".join(f"#{f}" for f in faces) + "))")
    add(f"MANIFOLD_SOLID_BREP('',#{shell})")
    data = "\n".join(f"#{i + 1}={t};" for i, t in enumerate(ents))
    return ("ISO-10303-21;\nHEADER;\nENDSEC;\nDATA;\n" + data
            + "\nENDSEC;\nEND-ISO-10303-21;\n")


def test_step_import_l_bracket_watertight():
    v, f = load_step(_step_l_bracket())
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert S.is_watertight(f)
    # enclosed volume via divergence theorem = 3.0 (L area 3 x height 1)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    vol = float(np.abs(np.einsum("ij,ij->i", a, np.cross(b, c)).sum()) / 6.0)
    assert abs(vol - 3.0) < 1e-9, vol


def test_step_import_feeds_meshing_pipeline():
    v, f = load_step(_step_l_bracket())
    mesh = C.mesh_plc(v, f, h=0.6)
    vol = float(np.abs(C._volumes(mesh.nodes, mesh.tets)).sum())
    assert abs(vol - 3.0) < 1e-6


def test_geometry_load_step_matlab_surface(tmp_path):
    p = tmp_path / "bracket.step"
    p.write_text(_step_l_bracket())
    s = run(f"g = geometry.load('{p}'); wt = g.watertight; "
            "info = geometry.inspect(g); nv = info.numVertices;",
            accelerate=False)
    assert bool(np.asarray(s.get("wt").host()).ravel()[0])
    assert float(np.asarray(s.get("nv").host()).ravel()[0]) >= 12


def test_step_unsupported_surface_errors_cleanly():
    bad = ("ISO-10303-21;\nDATA;\n"
           "#1=CARTESIAN_POINT('',(0.,0.,0.));\n"
           "#2=B_SPLINE_SURFACE_WITH_KNOTS('',3,3,(),());\n"
           "#3=ADVANCED_FACE('',(),#2,.T.);\n"
           "ENDSEC;\n")
    import pytest
    from runmat_tpu.errors import MatError
    with pytest.raises(MatError) as ei:
        load_step(bad)
    assert "B_SPLINE" in str(ei.value)


# ------------------------------------------------- surface remeshing ops

def test_refine_surface_split_reduces_edge_lengths():
    """Coarse box shell refined toward h=0.35: all edges end within the
    isotropic band, watertightness and enclosed volume preserved
    (VERDICT r2 weak #9: surface edge split/collapse + sizing fields)."""
    v, f = _l_bracket_surface()
    v2, f2 = S.refine_surface(v, f, 0.35, iters=6)
    assert S.is_watertight(f2)
    edges, _ = S.surface_edges(f2)
    L = np.linalg.norm(v2[edges[:, 0]] - v2[edges[:, 1]], axis=1)
    # isotropic band: near the 4/3 h split bound (feature-pinned corners
    # may hold a few slightly-longer edges)
    assert L.max() < 2.0 * 0.35
    assert 0.15 < L.mean() < 0.5
    # enclosed volume preserved (divergence theorem)
    def vol_of(vv, ff):
        a, b, c = vv[ff[:, 0]], vv[ff[:, 1]], vv[ff[:, 2]]
        return float(abs(np.einsum("ij,ij->i", a, np.cross(b, c)).sum()) / 6)
    assert abs(vol_of(v2, f2) - 3.0) < 0.05
    assert f2.shape[0] > f.shape[0]


def test_refine_surface_collapse_removes_tiny_edges():
    v, f = _l_bracket_surface()
    # first over-refine, then re-coarsen toward a large h
    v1, f1 = S.refine_surface(v, f, 0.3, iters=3)
    v2, f2 = S.refine_surface(v1, f1, 0.9, iters=4)
    assert S.is_watertight(f2)
    assert f2.shape[0] < f1.shape[0]          # collapses happened
    edges, _ = S.surface_edges(f2)
    L = np.linalg.norm(v2[edges[:, 0]] - v2[edges[:, 1]], axis=1)
    assert L.min() > 0.05                      # no degenerate slivers


def test_refine_surface_sizing_field():
    v, f = _l_bracket_surface()
    # finer near x=0, coarser near x=2
    sizer = lambda p: 0.25 + 0.35 * np.atleast_2d(p)[:, 0] / 2.0
    v2, f2 = S.refine_surface(v, f, sizer, iters=4)
    assert S.is_watertight(f2)
    edges, _ = S.surface_edges(f2)
    mids = (v2[edges[:, 0]] + v2[edges[:, 1]]) / 2.0
    L = np.linalg.norm(v2[edges[:, 0]] - v2[edges[:, 1]], axis=1)
    left = L[mids[:, 0] < 0.5]
    right = L[mids[:, 0] > 1.5]
    assert left.mean() < right.mean()          # adapts to the field
