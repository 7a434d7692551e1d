"""Plot fidelity tier 2: lit/shaded surfaces, Gouraud patches, decimation.

≙ reference runmat-plot/src/gpu/{surface,axis}.rs (vertex normals +
lighting uniforms) and src/plots/{surface,mesh,patch}.rs. Golden checks
are structural (node graph, poly counts, pixel-hash distinctness) rather
than stored images so they are robust to font/AA changes.
"""

import hashlib

import numpy as np
import pytest

from runmat_tpu.plot import figure as figmod
from runmat_tpu.plot.figure import Light, Surface
from runmat_tpu.plot.raster import Canvas, render_png
from runmat_tpu.plot.shade3d import stride_for
from runmat_tpu.plot.svg import probe_figure, render_svg
from runmat_tpu.session import Session


@pytest.fixture()
def sess():
    s = Session()
    yield s
    s.execute("close all")


def _fig():
    return figmod.gcf()


def _surface_script(sess, extra=""):
    r = sess.execute(
        "[X,Y] = meshgrid(linspace(-2,2,64));"
        "Z = X .* exp(-X.^2 - Y.^2);"
        "surf(X,Y,Z);" + extra)
    assert r.ok, r.error
    return _fig()


def test_surf_keeps_full_resolution(sess):
    f = _surface_script(sess)
    (s,) = f.ax.children
    assert s.kind == "surface"
    assert s.Z.shape == (64, 64)
    assert s.style == "faceted"
    assert f.ax.is3d


def test_mesh_style_and_surfc_waterfall(sess):
    r = sess.execute("Z = magic(8); mesh(Z);")
    assert r.ok, r.error
    assert _fig().ax.children[-1].style == "mesh"
    r = sess.execute("waterfall(Z);")
    assert r.ok, r.error
    assert _fig().ax.children[-1].style == "mesh"
    r = sess.execute("surfc(Z);")
    assert r.ok, r.error
    assert _fig().ax.children[-1].style == "faceted"


def test_shading_command_switches_style(sess):
    f = _surface_script(sess, "shading interp;")
    assert f.ax.children[0].style == "interp"
    sess.execute("shading flat;")
    assert f.ax.children[0].style == "flat"
    sess.execute("shading faceted;")
    assert f.ax.children[0].style == "faceted"
    r = sess.execute("shading bogus;")
    assert not r.ok


def test_light_and_camlight(sess):
    f = _surface_script(sess, "light('Position',[0 1 2],'Color',[1 0.9 0.8]);")
    assert len(f.ax.lights) == 1
    assert f.ax.lights[0].position == (0.0, 1.0, 2.0)
    sess.execute("camlight headlight;")
    assert len(f.ax.lights) == 2
    # camlight turns lighting on when it was 'none'
    sess.execute("lighting none; camlight;")
    assert f.ax.lighting == "flat"
    r = sess.execute("lighting gouraud;")
    assert r.ok and f.ax.lighting == "gouraud"


def _hash_png(f):
    return hashlib.md5(render_png(f)).hexdigest()


def test_lighting_modes_change_pixels():
    g = np.linspace(-2, 2, 40)
    X, Y = np.meshgrid(g, g)
    Z = np.sin(X) * np.cos(Y)
    out = {}
    for mode in ("none", "flat", "gouraud"):
        f = figmod.figure(97)
        ax = f.ax
        ax.children, ax.lights, ax.is3d = [], [], True
        ax.add(Surface(X, Y, Z))
        ax.lights.append(Light((1.0, 0.0, 1.0)))
        ax.lighting = mode
        out[mode] = _hash_png(f)
    figmod.close_figure(97)
    assert len(set(out.values())) == 3


def test_draft_svg_is_decimated(sess):
    f = _surface_script(sess)
    full = render_svg(f)
    draft = render_svg(f, draft=True)
    assert draft.count("<polygon") < full.count("<polygon") / 2
    assert full.count("<polygon") > 500


def test_stride_for_bounds_faces():
    assert stride_for((64, 64), 6000) == 1
    st = stride_for((1000, 1000), 6000)
    assert ((1000 - 1) // st) ** 2 <= 6000
    assert stride_for((2, 2), 10) == 1


def test_fill_tri_gouraud_interpolates():
    cv = Canvas(20, 20)
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    cv.fill_tri(np.array([1.0, 18.0, 1.0]), np.array([1.0, 1.0, 18.0]), cols)
    # corners pick up their vertex colors; center blends all three
    assert cv.buf[2, 2, 0] > 0.7              # near red vertex
    assert cv.buf[2, 15, 1] > 0.6             # near green vertex
    assert cv.buf[15, 2, 2] > 0.6             # near blue vertex
    c = cv.buf[6, 6]
    assert (c > 0.05).all() and (c < 0.95).all()


def test_patch_per_vertex_cdata_interp(sess):
    r = sess.execute("p = patch([0 1 1 0]', [0 0 1 1]', [1 2 3 4]');")
    assert r.ok, r.error
    node = _fig().ax.children[-1]
    assert node.kind == "patch"
    assert node.vertexcolors is not None
    vc = node.vertexcolors[0]
    assert vc.shape == (4, 3)
    assert not np.allclose(vc[0], vc[3])      # colormap spread across verts


def test_patch_per_face_cdata_flat(sess):
    r = sess.execute(
        "X = [0 2; 1 3; 0 2]; Y = [0 0; 1 1; 2 2]; patch(X, Y, [1 2]);")
    assert r.ok, r.error
    kids = [c for c in _fig().ax.children if c.kind == "patch"]
    assert len(kids) == 2                      # one flat patch per face
    assert kids[0].facecolor != kids[1].facecolor


def test_patch_named_color_and_props(sess):
    r = sess.execute(
        "patch([0 1 1], [0 0 1], 'r', 'EdgeColor', 'none');")
    assert r.ok, r.error
    node = _fig().ax.children[-1]
    assert node.facecolor == (1, 0, 0)
    assert node.edgecolor is None


def test_fill3_sets_depth_and_3d(sess):
    r = sess.execute("fill3([0 1 1], [0 0 1], [2 2 2], [1 2 3]);")
    assert r.ok, r.error
    ax = _fig().ax
    assert ax.is3d
    node = ax.children[-1]
    assert node.depth == pytest.approx(2.0)
    assert node.vertexcolors is not None


def test_surfl_adds_default_light(sess):
    r = sess.execute("surfl(magic(8));")
    assert r.ok, r.error
    assert len(_fig().ax.lights) == 1


def test_surface_renders_in_png_and_svg(sess):
    f = _surface_script(sess, "camlight; lighting gouraud;")
    png = render_png(f)
    assert png[:4] == b"\x89PNG" and len(png) > 5000
    sv = render_svg(f)
    assert "<polygon" in sv


def test_savefig_roundtrip_preserves_surface(sess, tmp_path):
    _surface_script(sess, "camlight; lighting gouraud;")
    p = tmp_path / "s.fig"
    r = sess.execute(f"savefig('{p}'); h = openfig('{p}');")
    assert r.ok, r.error
    f2 = figmod.gcf()
    kinds = [c.kind for c in f2.ax.children]
    assert "surface" in kinds
    s = [c for c in f2.ax.children if c.kind == "surface"][0]
    assert s.Z.shape == (64, 64)
    assert f2.ax.lighting == "gouraud"
    assert len(f2.ax.lights) == 1


def test_probe_hits_surface_vertex(sess):
    f = _surface_script(sess)
    hit = probe_figure(f, 0.5, 0.5)
    assert hit is not None
    assert "z" in hit
    assert hit["series"] == "surface"


def test_surf_with_color_matrix(sess):
    r = sess.execute(
        "[X,Y] = meshgrid(1:8); Z = X + Y; C = rand(8); surf(X,Y,Z,C);")
    assert r.ok, r.error
    s = _fig().ax.children[-1]
    assert not np.shares_memory(s.C, s.Z)
    assert s.C.shape == (8, 8)


def test_surface_view_orbit_changes_render(sess):
    f = _surface_script(sess)
    h1 = _hash_png(f)
    for ax in f.axes:
        ax.view = (20.0, 60.0)
    h2 = _hash_png(f)
    assert h1 != h2
