"""B-rep kernel + extended STEP importer (VERDICT r3 item 6).

Covers the analytic-surface set (plane/cylinder/cone/sphere/torus), B-spline
patches, hole bridging, periodic-band stitching, apex/pole degeneracies,
shared-edge watertightness, per-triangle face IDs, and the fillet+bore
acceptance part feeding the cavity meshing pipeline.

≙ reference: runmat-geometry/io OCCT STEP import + runmat-meshing/cad face
tessellation (/root/reference/crates/runmat-geometry/io/src/occt/)."""

import numpy as np
import pytest

import step_fixtures as F
from runmat_tpu.fea import brep as B
from runmat_tpu.fea.step_import import load_step, load_step_brep
from runmat_tpu.fea.surface import is_watertight


def _volume(v, fc):
    t = v[fc]
    return float(np.einsum("ij,ij->i",
                           np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]),
                           t[:, 0]).sum() / 6.0)


# ---------------------------------------------------------------- solids --- #

CASES = [
    ("can", F.can_step, 2 * np.pi, 0.02),
    ("cone", F.cone_step, 2 * np.pi / 3, 0.02),
    ("sphere", F.sphere_step, 4 * np.pi / 3, 0.04),
    ("torus", F.torus_step, 2 * np.pi ** 2 * 2 * 0.25, 0.06),
    ("plate_bore", F.plate_bore_step,
     2.0 * 1.5 * 0.4 - np.pi * 0.3 ** 2 * 0.4, 0.01),
    ("fillet_bore", F.fillet_bore_step,
     2.0 - (1 - np.pi / 4) * 0.3 ** 2 * 2 - np.pi * 0.15 ** 2, 0.005),
]


@pytest.mark.parametrize("name,gen,vol,rtol", CASES,
                         ids=[c[0] for c in CASES])
def test_step_solid_watertight_with_volume(name, gen, vol, rtol):
    v, fc, ids, info = load_step_brep(gen())
    assert is_watertight(fc), name
    got = abs(_volume(v, fc))
    assert abs(got - vol) <= rtol * vol, (name, got, vol)
    # every triangle carries a valid face ID
    assert ids.shape[0] == fc.shape[0]
    assert set(np.unique(ids)) <= {r["id"] for r in info}


def test_bspline_box_watertight_and_bulged():
    v, fc, ids, info = load_step_brep(F.bspline_box_step())
    assert is_watertight(fc)
    # bulge: exact solid volume = 4 + 0.8 * (1/3)*(1/3) * 4 = 4.3556
    got = abs(_volume(v, fc))
    assert 4.05 < got <= 4.36
    assert v[:, 2].max() > 1.15          # the bulge apex is sampled
    patch = [r for r in info
             if r["type"] == "B_SPLINE_SURFACE_WITH_KNOTS"]
    assert len(patch) == 1
    assert patch[0]["area"] > 4.0        # curved: more than the flat face


def test_face_info_areas_and_centroids():
    _v, _fc, _ids, info = load_step_brep(F.can_step(r=1.0, h=2.0))
    by_type = {}
    for r in info:
        by_type.setdefault(r["type"], []).append(r)
    wall = by_type["CYLINDRICAL_SURFACE"][0]
    assert abs(wall["area"] - 2 * np.pi * 2) < 0.1
    assert abs(wall["centroid"][2] - 1.0) < 1e-6
    caps = sorted(by_type["PLANE"], key=lambda r: r["centroid"][2])
    assert abs(caps[0]["centroid"][2] - 0.0) < 1e-9
    assert abs(caps[1]["centroid"][2] - 2.0) < 1e-9
    assert abs(caps[0]["area"] - np.pi) < 0.05


def test_load_step_back_compat_two_tuple():
    v, fc = load_step(F.plate_bore_step())
    assert v.shape[1] == 3 and fc.shape[1] == 3
    assert is_watertight(fc)


def test_fillet_bore_feeds_cavity_meshing():
    from runmat_tpu.fea.cavity import _volumes, mesh_plc
    v, fc = load_step(F.fillet_bore_step())
    mesh = mesh_plc(v, fc, h=0.35)
    vol = float(np.abs(_volumes(mesh.nodes, mesh.tets)).sum())
    true = 2.0 - (1 - np.pi / 4) * 0.09 * 2 - np.pi * 0.15 ** 2
    assert abs(vol - true) < 0.05 * true


# ------------------------------------------------------------ B-spline --- #

def test_bspline_basis_partition_of_unity():
    deg = 3
    knots = np.array([0, 0, 0, 0, 1, 2, 2, 3, 3, 3, 3], float)
    t = np.linspace(0, 3, 57)
    N, span = B.bspline_basis(deg, knots, t)
    np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-12)
    assert (N >= -1e-12).all()
    assert span.min() >= deg and span.max() <= knots.size - deg - 2


def test_bspline_curve_interpolates_endpoints_and_projects():
    ctrl = np.array([[0, 0, 0], [1, 2, 0], [3, 2, 1], [4, 0, 1]], float)
    cv = B.BSplineCurve(3, [0, 0, 0, 0, 1, 1, 1, 1], ctrl)
    np.testing.assert_allclose(cv.point(np.array([0.0]))[0], ctrl[0],
                               atol=1e-12)
    np.testing.assert_allclose(cv.point(np.array([1.0]))[0], ctrl[-1],
                               atol=1e-12)
    # param_of returns the parameter of a curve point
    t0 = 0.3777
    p = cv.point(np.array([t0]))[0]
    assert abs(cv.param_of(p) - t0) < 1e-6


def test_bspline_surface_inversion_roundtrip():
    ctrl = np.zeros((3, 3, 3))
    for i in range(3):
        for j in range(3):
            ctrl[i, j] = [i, j, 0.3 * i * j]
    s = B.BSplineSurface(2, 2, [0, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1], ctrl)
    uv = np.array([[0.2, 0.7], [0.5, 0.5], [0.9, 0.1]])
    p = s.point(uv)
    uv2 = s.uv(p)
    np.testing.assert_allclose(s.point(uv2), p, atol=1e-8)


def test_rational_bspline_quarter_circle_exact():
    """NURBS weights: the classic 3-point rational quadratic quarter arc."""
    w = np.array([1.0, np.sqrt(2) / 2, 1.0])
    ctrl = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    cv = B.BSplineCurve(2, [0, 0, 0, 1, 1, 1], ctrl, w)
    t = np.linspace(0, 1, 33)
    p = cv.point(t)
    np.testing.assert_allclose(np.linalg.norm(p[:, :2], axis=1), 1.0,
                               atol=1e-12)


# ------------------------------------------------------------- edges ----- #

def test_edge_reverse_sense_arc():
    """EDGE_CURVE same_sense=.F.: the edge runs against the curve param."""
    c = B.CircleCurve(B.Frame([0, 0, 0]), 1.0)
    p0, p1 = np.array([1.0, 0, 0]), np.array([0.0, 1.0, 0])
    fwd = B.BrepEdge(1, c, p0, p1, forward=True)
    rev = B.BrepEdge(2, c, p0, p1, forward=False)
    # forward: quarter arc through (cos45, sin45); reverse: 3/4 arc the
    # other way through (0,-1)
    pf = fwd.polyline(1e-3)
    pr = rev.polyline(1e-3)
    assert pf.shape[0] < pr.shape[0]
    assert (pf[:, 1] >= -1e-9).all()
    assert (pr[:, 1] < -0.9).any()
    np.testing.assert_allclose(pf[0], p0, atol=1e-12)
    np.testing.assert_allclose(pr[-1], p1, atol=1e-12)


def test_ellipse_edge_polyline_on_ellipse():
    c = B.EllipseCurve(B.Frame([0, 0, 0]), 2.0, 1.0)
    p0 = np.array([2.0, 0, 0])
    e = B.BrepEdge(1, c, p0, p0)           # full ellipse
    pts = e.polyline(1e-3)
    x, y = pts[:, 0], pts[:, 1]
    np.testing.assert_allclose((x / 2) ** 2 + y ** 2, 1.0, atol=1e-6)
    assert pts.shape[0] > 32


# ------------------------------------------------------- tessellation ---- #

def test_plane_with_hole_area():
    sq = B.Plane(B.Frame([0, 0, 0]))
    corners = [np.array([-2.0, -2, 0]), np.array([2.0, -2, 0]),
               np.array([2.0, 2, 0]), np.array([-2.0, 2, 0])]
    edges = []
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        edges.append((B.BrepEdge(10 + i, B.LineCurve(a, b - a), a, b), True))
    he = B.BrepEdge(20, B.CircleCurve(B.Frame([0, 0, 0]), 1.0),
                    np.array([1.0, 0, 0]), np.array([1.0, 0, 0]))
    face = B.BrepFace(1, sq, [edges, [(he, True)]], True)
    t3 = B.tessellate_face(face, 0.01)
    area = 0.5 * np.linalg.norm(
        np.cross(t3[:, 1] - t3[:, 0], t3[:, 2] - t3[:, 0]), axis=1).sum()
    assert abs(area - (16 - np.pi)) < 0.05


def test_chord_tolerance_scales_triangle_count():
    coarse = B.BrepModel([B.BrepFace(1, B.SphereSurf(B.Frame([0, 0, 0]),
                                                     1.0), [])])
    v1, f1, _ = coarse.tessellate(rel_tol=0.02)
    v2, f2, _ = coarse.tessellate(rel_tol=0.002)
    assert f2.shape[0] > f1.shape[0]
    assert is_watertight(f1) and is_watertight(f2)


def test_unsupported_surface_listed_in_error():
    bad = ("ISO-10303-21;\nDATA;\n"
           "#1=AXIS2_PLACEMENT_3D('',#2,$,$);\n"
           "#2=CARTESIAN_POINT('',(0.,0.,0.));\n"
           "#3=SWEPT_SURFACE('',#1);\n"
           "#4=ADVANCED_FACE('',(),#3,.T.);\n"
           "ENDSEC;\n")
    from runmat_tpu.errors import MatError
    with pytest.raises(MatError) as ei:
        load_step(bad)
    assert "SWEPT_SURFACE" in str(ei.value)


# ------------------------------------------------- face:N BC selection --- #

def test_face_selection_matlab_path(tmp_path):
    """End-to-end VERDICT r3 item-6 'done' criterion: a STEP part with a
    fillet + bore meshes watertight and boundary conditions address
    B-rep faces by ID (≙ reference face-selection diagnostics tier)."""
    from helpers import run
    p = tmp_path / "can.step"
    p.write_text(F.can_step(r=1.0, h=2.0))
    s = run(f"""
g = geometry.load('{p}');
regions = geometry.listRegions(g);
info = g.faceInfo;
caps = [];
for k = 1:numel(info)
  if info(k).area < 4
    caps(end+1) = info(k).id;
  end
end
bot = caps(1); top = caps(2);
m = fea.model(g, fea.material(), ...
    fea.boundaryCondition('fixed', sprintf('face:%d', bot)), ...
    fea.load('force', sprintf('face:%d', top), [0 0 -1000]));
st = fea.study(m, 'linear_static');
r = fea.run(st);
u = r.displacement;
nodes = r.mesh.nodes;
umax = max(abs(u(:)));
ubot = max(max(abs(u(nodes(:,3) < 1e-9, :))));
""")
    regions = s.get("regions")
    names = [str(c.to_str()) for c in regions.data.reshape(-1)]
    assert "domain" in names and "face:1" in names and "face:3" in names
    umax = float(s.get("umax").host().reshape(-1)[0])
    ubot = float(s.get("ubot").host().reshape(-1)[0])
    assert umax > 0.0
    assert ubot <= 1e-12 * max(umax, 1.0)   # clamped face does not move
