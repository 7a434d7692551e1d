"""Client-side WebGL scene export (VERDICT r3 weak #9): figures cross the
wire as typed vertex/index buffers and the browser orbits locally with zero
server round trips per frame (≙ runmat-plot's GPU scene graph consumed by
wgpu render pipelines, crates/runmat-plot/src/gpu/{surface,line,scatter3,
axis}.rs — re-homed to the client GPU)."""

import base64

import numpy as np

from helpers import run
from runmat_tpu.server import handle_request
from runmat_tpu.session import Session
from runmat_tpu.plot import figure as fm
from runmat_tpu.plot.figure import (Figure, Surface, TriMesh, Line, Scatter,
                                    Patch, Light)
from runmat_tpu.plot.webgl import export_scene


def _f32(d):
    return np.frombuffer(base64.b64decode(d), np.float32)


def _u8(d):
    return np.frombuffer(base64.b64decode(d), np.uint8)


def _u32(d):
    return np.frombuffer(base64.b64decode(d), np.uint32)


def _fig3d():
    f = Figure(99)
    f.ax.is3d = True
    return f


def _peaks(n=20):
    x = np.linspace(-2, 2, n)
    X, Y = np.meshgrid(x, x)
    return X, Y, np.exp(-(X ** 2 + Y ** 2))


def test_faceted_surface_exports_per_face_colors_and_edges():
    f = _fig3d()
    X, Y, Z = _peaks(10)
    f.ax.add(Surface(X, Y, Z, style="faceted"))
    sc = export_scene(f)
    assert sc["num"] == 99 and len(sc["axes"]) == 1
    draws = sc["axes"][0]["draws"]
    kinds = [d["kind"] for d in draws]
    assert kinds == ["tris", "lines"]
    t = draws[0]
    # flat/faceted duplicates 4 verts per quad: 9*9 quads
    assert t["nv"] == 9 * 9 * 4
    assert t["ni"] == 9 * 9 * 6
    pos = _f32(t["pos"]).reshape(-1, 3)
    assert pos.shape[0] == t["nv"]
    # normalized, centered data coords
    assert pos.min() >= -0.5 - 1e-6 and pos.max() <= 0.5 + 1e-6
    idx = _u32(t["idx"])
    assert idx.max() == t["nv"] - 1
    col = _u8(t["col"]).reshape(-1, 3)
    assert col.shape[0] == t["nv"]
    # each quad's 4 verts share one color (flat shading)
    c4 = col.reshape(-1, 4, 3)
    assert (c4 == c4[:, :1]).all()


def test_interp_surface_shares_vertices():
    f = _fig3d()
    X, Y, Z = _peaks(10)
    f.ax.add(Surface(X, Y, Z, style="interp"))
    t = export_scene(f)["axes"][0]["draws"][0]
    assert t["nv"] == 100                      # shared grid vertices
    assert t["ni"] == 9 * 9 * 6
    col = _u8(t["col"]).reshape(-1, 3)
    # colormap colors vary across the gaussian
    assert len(np.unique(col, axis=0)) > 10


def test_gouraud_lighting_darkens_vertex_colors():
    X, Y, Z = _peaks(10)
    f = _fig3d()
    f.ax.add(Surface(X, Y, Z, style="interp"))
    unlit = _u8(export_scene(f)["axes"][0]["draws"][0]["col"]).astype(int)
    f2 = _fig3d()
    f2.ax.add(Surface(X, Y, Z, style="interp"))
    f2.ax.lights.append(Light(position=(0.3, -0.4, 1.0)))
    f2.ax.lighting = "gouraud"
    lit = _u8(export_scene(f2)["axes"][0]["draws"][0]["col"]).astype(int)
    assert lit.sum() < unlit.sum()             # baked Lambert shade < 1
    assert (lit <= unlit + 1).all()


def test_mesh_style_exports_colored_wireframe_only():
    f = _fig3d()
    X, Y, Z = _peaks(8)
    f.ax.add(Surface(X, Y, Z, style="mesh"))
    draws = export_scene(f)["axes"][0]["draws"]
    assert [d["kind"] for d in draws] == ["lines"]
    ln = draws[0]
    col = _u8(ln["col"]).reshape(-1, 3)
    assert col.shape[0] == ln["nv"]
    assert len(np.unique(col, axis=0)) > 5     # per-vertex colormap colors


def test_line_nan_breaks_segments():
    f = _fig3d()
    x = np.array([0.0, 1.0, np.nan, 2.0, 3.0])
    f.ax.add(Line(x, x, z=x, color=(1, 0, 0)))
    draws = export_scene(f)["axes"][0]["draws"]
    ln = [d for d in draws if d["kind"] == "lines"][0]
    # 4 candidate segments, 2 killed by the NaN vertex -> 2 segments
    assert ln["nv"] == 4
    pos = _f32(ln["pos"]).reshape(-1, 3)
    assert np.isfinite(pos).all()


def test_scatter_exports_points_with_size():
    f = _fig3d()
    f.ax.add(Scatter([0, 1, 2], [0, 1, 2], z=[0, 1, 2], sizes=64.0))
    d = export_scene(f)["axes"][0]["draws"][0]
    assert d["kind"] == "points" and d["nv"] == 3
    assert d["size"] == 8.0                    # sqrt(64)


def test_trimesh_flat_lit_duplicates_interp_shares():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1.0]])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    f = _fig3d()
    f.ax.add(TriMesh(verts, faces, cvals=verts[:, 2], style="interp"))
    t = export_scene(f)["axes"][0]["draws"][0]
    assert t["nv"] == 4 and t["ni"] == 6       # shared verts
    f2 = _fig3d()
    f2.ax.add(TriMesh(verts, faces, cvals=verts[:, 2], style="flat"))
    f2.ax.lights.append(Light())
    t2 = export_scene(f2)["axes"][0]["draws"][0]
    assert t2["nv"] == 6 and t2["ni"] == 6     # per-face duplication


def test_patch_fan_triangulation_with_vertex_colors():
    poly = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]])
    vc = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0.0]])
    f = _fig3d()
    f.ax.add(Patch([poly], facecolor=None, edgecolor=(0, 0, 0),
                   vertexcolors=[vc]))
    draws = export_scene(f)["axes"][0]["draws"]
    t = [d for d in draws if d["kind"] == "tris"][0]
    assert t["ni"] == 6                        # quad -> 2 fan triangles
    ln = [d for d in draws if d["kind"] == "lines"][0]
    assert ln["nv"] == 8                       # closed outline, 4 segments


def test_decimation_caps_face_count():
    f = _fig3d()
    X, Y, Z = _peaks(200)                      # 199^2 = 39601 quads
    f.ax.add(Surface(X, Y, Z, style="flat"))
    t = export_scene(f, max_faces=1000)["axes"][0]["draws"][0]
    assert t["ni"] / 6 <= 1000


def test_ticks_normalized_and_labeled():
    f = _fig3d()
    X, Y, Z = _peaks(8)
    f.ax.add(Surface(X, Y, Z))
    ax = export_scene(f)["axes"][0]
    for name in "xyz":
        for tpos, lbl in ax["ticks"][name]:
            assert -0.5 - 1e-9 <= tpos <= 0.5 + 1e-9
            assert isinstance(lbl, str) and lbl
    assert ax["view"] == [-37.5, 30.0]
    assert len(ax["lims"]) == 3


def test_2d_axes_not_exported():
    f = Figure(98)
    f.ax.add(Line([0, 1], [0, 1]))
    assert export_scene(f)["axes"] == []


def test_server_figure_webgl_op_roundtrip():
    s = Session(accelerate=False)
    handle_request(s, {"id": 0, "op": "execute", "source": "close all"})
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "[X, Y] = meshgrid(-2:.5:2); "
                                 "surf(X, Y, X.^2 - Y.^2); "
                                 "camlight; lighting gouraud"})
    r = handle_request(s, {"id": 2, "op": "figures"})
    assert r["ok"] and r["figures"][0]["webgl"] is True
    num = r["figures"][0]["num"]
    g = handle_request(s, {"id": 3, "op": "figure_webgl", "fig": num})
    assert g["ok"]
    ax = g["scene"]["axes"][0]
    assert any(d["kind"] == "tris" for d in ax["draws"])
    # buffers decode to consistent sizes
    for d in ax["draws"]:
        pos = _f32(d["pos"])
        assert pos.size == d["nv"] * 3
        assert _u8(d["col"]).size == d["nv"] * 3
    # camera-sync-only view op: no svg in the response
    v = handle_request(s, {"id": 4, "op": "view", "fig": num,
                           "az": 10.0, "el": 20.0, "nosvg": True})
    assert v["ok"] and "svg" not in v
    g2 = handle_request(s, {"id": 5, "op": "figure_webgl", "fig": num})
    assert g2["scene"]["axes"][0]["view"] == [10.0, 20.0]
    miss = handle_request(s, {"id": 6, "op": "figure_webgl", "fig": 777})
    assert not miss["ok"]


def test_imagesc_device_colormap_parity():
    """Device-side colormap (accel/dense.py _b_cmap): gathers u8 RGB
    instead of the f64 field; parity with the host LUT within the u8
    quantum."""
    from runmat_tpu.plot import figure as fm
    s = Session(accelerate=True)
    s.execute("close all")
    r = s.execute("rng(5); X = rand(32); imagesc(X);")
    assert r.error is None
    host_rgb = fm._FIGURES[max(fm._FIGURES)].ax.children[-1].data.copy()
    s.execute("close all")
    r = s.execute("rng(5); Xd = gpuArray(rand(32)); imagesc(Xd);")
    assert r.error is None
    dev_rgb = fm._FIGURES[max(fm._FIGURES)].ax.children[-1].data.copy()
    s.execute("close all")
    assert dev_rgb.shape == host_rgb.shape
    assert np.abs(host_rgb - dev_rgb).max() <= 1.0 / 255.0 + 1e-6
