"""Surface geometry + surface-bounded tet meshing (≙ runmat-meshing
cad/plc/tetrahedron pipeline + runmat-geometry-io import/export)."""

import numpy as np
import pytest

from runmat_tpu.fea import surface as surf
from runmat_tpu.fea.delaunay import _radius_ratio, _tet_volumes


def _box_surface(L=1.0, W=1.0, H=1.0):
    """12-triangle closed box surface."""
    v = np.array([[0, 0, 0], [L, 0, 0], [L, W, 0], [0, W, 0],
                  [0, 0, H], [L, 0, H], [L, W, H], [0, W, H]], float)
    quads = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
             (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7)]
    f = []
    for a, b, c, d in quads:
        f += [[a, b, c], [a, c, d]]
    return v, np.array(f, dtype=np.int64)


def test_weld_vertices_dedupes():
    v, f = _box_surface()
    soup = v[f]                           # (12, 3, 3) duplicated soup
    wv, wf = surf.weld_vertices(soup)
    assert wv.shape[0] == 8
    assert wf.shape == (12, 3)
    assert surf.is_watertight(wf)


def test_watertight_detects_hole():
    v, f = _box_surface()
    assert surf.is_watertight(f)
    assert not surf.is_watertight(f[:-1])   # remove one triangle


def test_points_inside_box():
    v, f = _box_surface()
    pts = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.01, 0.01, 0.01],
                    [-0.1, 0.5, 0.5], [0.5, 0.5, 1.2]])
    got = surf.points_inside(v, f, pts)
    assert got.tolist() == [True, False, True, False, False]


def test_mesh_surface_box_volume_and_quality():
    v, f = _box_surface()
    mesh = surf.mesh_surface(v, f, h=0.35)
    assert mesh.n_tets > 10
    vol = np.abs(_tet_volumes(mesh.nodes, mesh.tets)).sum()
    assert vol == pytest.approx(1.0, rel=0.15)   # fills the box
    q = _radius_ratio(mesh.nodes, mesh.tets)
    assert q.min() > 0.0 and q.mean() > 0.3


def test_mesh_surface_rejects_open_surface():
    from runmat_tpu.errors import MatError
    v, f = _box_surface()
    with pytest.raises(MatError):
        surf.mesh_surface(v, f[:-1], h=0.5)


def test_reconnect_never_worsens_quality():
    v, f = _box_surface()
    mesh = surf.mesh_surface(v, f, h=0.4, optimize=False)
    q0 = _radius_ratio(mesh.nodes, mesh.tets).min()
    vol0 = np.abs(_tet_volumes(mesh.nodes, mesh.tets)).sum()
    out = surf.reconnect(mesh)
    q1 = _radius_ratio(out.nodes, out.tets).min()
    vol1 = np.abs(_tet_volumes(out.nodes, out.tets)).sum()
    assert q1 >= q0 - 1e-12
    assert vol1 == pytest.approx(vol0, rel=1e-9)   # volume preserved


def test_obj_roundtrip(tmp_path):
    v, f = _box_surface(2.0, 1.0, 1.0)
    lines = ["v %g %g %g" % tuple(p) for p in v]
    lines += ["f %d %d %d" % tuple(p + 1) for p in f]
    lv, lf = surf.load_obj("\n".join(lines))
    assert np.allclose(lv, v) and (lf == f).all()


def test_obj_quad_fan_triangulation():
    text = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    v, f = surf.load_obj(text)
    assert f.shape == (2, 3)


def test_ply_ascii_and_binary():
    v, f = _box_surface()
    # ascii
    head = ("ply\nformat ascii 1.0\nelement vertex 8\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 12\nproperty list uchar int vertex_indices\n"
            "end_header\n")
    body = "".join("%g %g %g\n" % tuple(p) for p in v)
    body += "".join("3 %d %d %d\n" % tuple(p) for p in f)
    lv, lf = surf.load_ply((head + body).encode())
    assert np.allclose(lv, v) and (lf == f).all()
    # binary little endian
    import struct
    headb = head.replace("format ascii 1.0",
                         "format binary_little_endian 1.0").encode()
    bb = b"".join(struct.pack("<3f", *p) for p in v)
    bb += b"".join(struct.pack("<B3i", 3, *p) for p in f)
    bv, bf = surf.load_ply(headb + bb)
    assert np.allclose(bv, v, atol=1e-6) and (bf == f).all()


def test_stl_roundtrip_binary_and_ascii(tmp_path):
    v, f = _box_surface()
    raw = surf.save_stl(v, f)
    lv, lf = surf.load_stl(raw)
    assert lv.shape[0] == 8 and surf.is_watertight(lf)
    ascii_stl = ["solid test"]
    for tri in v[f]:
        ascii_stl.append(" facet normal 0 0 0\n  outer loop")
        for p in tri:
            ascii_stl.append("   vertex %g %g %g" % tuple(p))
        ascii_stl.append("  endloop\n endfacet")
    ascii_stl.append("endsolid test")
    av, af = surf.load_stl("\n".join(ascii_stl).encode())
    assert av.shape[0] == 8 and surf.is_watertight(af)


def test_matlab_geometry_surface_pipeline(tmp_path):
    """geometry.load -> geometry.meshes -> geometry.meshQuality -> save."""
    from helpers import run
    v, f = _box_surface()
    stl = tmp_path / "part.stl"
    stl.write_bytes(surf.save_stl(v, f))
    out = tmp_path / "out.stl"
    s = run(f"g = geometry.load('{stl}'); "
            f"wt = g.watertight; "
            f"m = geometry.meshes(g, 0.4); "
            f"q = geometry.meshQuality(m); "
            f"mq = q.mean_quality; nt = q.n_tets; tv = q.total_volume; "
            f"geometry.save(g, '{out}');")
    assert bool(s.get("wt").host())
    assert float(s.get("nt").host()) > 10
    assert abs(float(s.get("tv").host()) - 1.0) < 0.2
    assert float(s.get("mq").host()) > 0.3
    assert out.exists() and out.stat().st_size > 84
