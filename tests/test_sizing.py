"""Curvature-adaptive sizing fields (≙ runmat-meshing/size + cad
curvature sizing): analytic surface curvature, discrete shell curvature,
gradation limiting, octree-adaptive seeding, graded cavity meshing."""

import numpy as np
import pytest

import step_fixtures as F
from runmat_tpu.fea import brep as B
from runmat_tpu.fea import sizing as SZ
from runmat_tpu.fea.step_import import load_step


def test_analytic_curvatures():
    uv = np.array([[0.3, 0.7], [1.2, -0.4]])
    assert np.allclose(B.Plane(B.Frame([0, 0, 0])).max_curvature(uv), 0.0)
    assert np.allclose(
        B.Cylinder(B.Frame([0, 0, 0]), 2.0).max_curvature(uv), 0.5)
    assert np.allclose(
        B.SphereSurf(B.Frame([0, 0, 0]), 0.5).max_curvature(uv), 2.0)
    assert np.allclose(
        B.Torus(B.Frame([0, 0, 0]), 2.0, 0.25).max_curvature(uv), 4.0)
    # cone: kappa = cos(a) / radius(v)
    cone = B.Cone(B.Frame([0, 0, 0]), 1.0, 0.3)
    uvc = np.array([[0.0, 2.0]])
    expect = np.cos(0.3) / (1.0 + 2.0 * np.sin(0.3))
    assert np.allclose(cone.max_curvature(uvc), expect)


def test_generic_numeric_curvature_matches_analytic():
    """The fundamental-form fallback agrees with closed forms (drives
    B-spline patches, where no closed form exists)."""
    sph = B.SphereSurf(B.Frame([1, 2, 3]), 1.5)
    uv = np.array([[0.4, 0.2], [2.0, -0.8]])
    generic = B.Surface.max_curvature(sph, uv)
    np.testing.assert_allclose(generic, 1.0 / 1.5, rtol=1e-5)
    tor = B.Torus(B.Frame([0, 0, 0]), 2.0, 0.5)
    uvt = np.array([[0.3, 0.1]])
    np.testing.assert_allclose(B.Surface.max_curvature(tor, uvt),
                               tor.max_curvature(uvt), rtol=1e-4)


def test_sizing_field_gradation_limit():
    verts = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    edges = np.array([[0, 1], [1, 2]])
    f = SZ.SizingField(verts, np.array([0.1, 10.0, 10.0]), edges=edges,
                       gradation=1.5)
    # h may grow at most 0.5 per unit distance from the small value
    assert f.h[1] <= 0.1 + 0.5 * 1.0 + 1e-12
    assert f.h[2] <= f.h[1] + 0.5 * 1.0 + 1e-12
    # queries are the gradation-compatible Lipschitz extension:
    # h(x) = min_i (h_i + (g-1) |x - x_i|), clamped to hmax
    assert np.isclose(f(np.array([[0.1, 0, 0]]))[0], 0.1 + 0.5 * 0.1)
    assert np.isclose(f(np.array([[0.0, 0, 0]]))[0], f.h[0])
    # far away the field saturates at hmax, never above
    assert f(np.array([[100.0, 0, 0]]))[0] == f.h.max()


def test_brep_curvature_sizing_and_adaptive_seeds():
    v, fc = load_step(F.plate_bore_step())
    field = SZ.discrete_curvature_sizing(v, fc)
    # near the bore wall (distance from axis ~ 0.3) the field is finer
    # than on the flat plate far from the bore
    d_axis = np.hypot(v[:, 0] - 1.0, v[:, 1] - 0.75)
    near = field.h[np.abs(d_axis - 0.3) < 0.05]
    far = field.h[d_axis > 0.65]
    assert near.mean() < 0.55 * far.mean()
    seeds = SZ.adaptive_seeds(v, fc, field)
    if len(seeds):
        # seeds respect the local size: none closer to the shell than
        # 0.4 h(seed)
        from scipy.spatial import cKDTree
        d, _ = cKDTree(v).query(seeds)
        assert (d > 0.4 * field(seeds) - 1e-12).all()


def test_graded_cavity_mesh_fillet_bore():
    """Sizing-field-driven mesh_plc produces a graded mesh (smaller tets
    near the fillet/bore) with the exact part volume."""
    from runmat_tpu.fea.cavity import _volumes, mesh_plc
    v, fc = load_step(F.fillet_bore_step())
    # hmin=0.07 keeps the bore target (h=0.074) unclamped while bounding
    # CI cost; grading contrast bore:flat is ~7:1 in h
    field = SZ.discrete_curvature_sizing(v, fc, hmax=0.5, hmin=0.07)
    mesh = mesh_plc(v, fc, h=field)
    vol = float(np.abs(_volumes(mesh.nodes, mesh.tets)).sum())
    true = 2.0 - (1 - np.pi / 4) * 0.09 * 2 - np.pi * 0.15 ** 2
    assert abs(vol - true) < 0.05 * true
    # graded: element volumes near the bore wall (axis at x=1.5, y=0.5)
    # are smaller than in the flat region away from bore AND fillet
    cen = mesh.nodes[mesh.tets].mean(axis=1)
    ev = np.abs(_volumes(mesh.nodes, mesh.tets))
    d_bore = np.hypot(cen[:, 0] - 1.5, cen[:, 1] - 0.5)
    near = ev[d_bore < 0.3]
    flat = ev[(d_bore > 0.6) & (cen[:, 1] > 0.35) & (cen[:, 2] < 0.5)]
    assert near.size and flat.size
    assert np.median(near) < 0.5 * np.median(flat)


def test_geometry_meshes_adaptive_matlab(tmp_path):
    from helpers import run
    p = tmp_path / "plate.step"
    p.write_text(F.plate_bore_step())
    s = run(f"g = geometry.load('{p}');"
            "m = geometry.meshes(g, 'adaptive');"
            "q = geometry.meshQuality(m); n = size(m.elements, 1);")
    assert int(s.get("n").host().reshape(-1)[0]) > 50
