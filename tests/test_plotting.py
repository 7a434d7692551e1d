"""Plotting engine: scene graph + headless SVG/PNG export.

≙ reference runmat-plot (figure lifecycle, 30+ plot commands, headless
export — crates/runmat-plot/src/{plots,export}/)."""

import os
import tempfile

import numpy as np
import pytest

from helpers import run
from runmat_tpu.session import Session


@pytest.fixture(autouse=True)
def _fresh_figures():
    from runmat_tpu.plot.figure import close_all
    close_all()
    yield
    close_all()


def export(src, name):
    d = tempfile.mkdtemp()
    p = os.path.join(d, name)
    s = Session(accelerate=False)
    s.run_source(f"rng(0); {src} saveas(gcf, '{p}');", "t")
    assert os.path.exists(p)
    with open(p, "rb") as f:
        data = f.read()
    return data


def test_line_plot_svg_contains_elements():
    data = export("x = 0:0.1:10; plot(x, sin(x), 'r--'); title('waves'); "
                  "xlabel('t'); grid on;", "a.svg")
    txt = data.decode()
    assert "<svg" in txt and "polyline" in txt
    assert "waves" in txt and ">t<" in txt
    assert "stroke-dasharray" in txt       # the '--' style
    assert "#ff0000" in txt                # the 'r' color


def test_png_signature_and_size():
    data = export("histogram(randn(1, 1000), 20);", "h.png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 1000


def test_multi_series_and_legend():
    data = export("plot(1:10, (1:10).^2, 1:10, (1:10).^1.5); "
                  "legend('quad', 'sesqui');", "l.svg")
    txt = data.decode()
    assert "quad" in txt and "sesqui" in txt


def test_subplot_two_axes():
    data = export("subplot(2,1,1); plot(1:10); subplot(2,1,2); bar([1 2 3]);",
                  "s.svg")
    txt = data.decode()
    assert txt.count('<rect x=') >= 2   # two axes boxes


def test_surf_3d_png():
    data = export("[X, Y] = meshgrid(-2:0.4:2, -2:0.4:2); "
                  "surf(X, Y, X .* exp(-X.^2 - Y.^2));", "su.png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_imagesc_embeds_image():
    data = export("imagesc(rand(8));", "i.svg")
    assert b"<image" in data and b"base64" in data


def test_scatter_pie_area_stairs_stem():
    for cmd, name in [("scatter(rand(1,30), rand(1,30));", "sc.svg"),
                      ("pie([1 2 3]);", "p.svg"),
                      ("area(1:5, [1 3 2 4 1]);", "ar.svg"),
                      ("stairs([1 3 2 4]);", "st.svg"),
                      ("stem(1:5, [2 1 3 1 2]);", "sm.svg")]:
        data = export(cmd, name)
        assert b"<svg" in data


def test_log_axes():
    data = export("semilogy(1:50, exp(0.2 * (1:50)));", "ly.svg")
    assert b"<svg" in data


def test_hold_accumulates():
    s = Session(accelerate=False)
    s.run_source("plot(1:5); hold on; plot(5:-1:1);", "t")
    from runmat_tpu.plot.figure import gca
    assert len(gca().children) == 2


def test_close_and_figure_numbers():
    s = Session(accelerate=False)
    s.run_source("f1 = figure; f2 = figure; close(f1);", "t")
    assert float(s.get("f2").host()[0, 0]) == 2.0
    from runmat_tpu.plot.figure import _FIGURES
    assert 1 not in _FIGURES and 2 in _FIGURES


def test_print_and_exportgraphics():
    d = tempfile.mkdtemp()
    s = Session(accelerate=False)
    s.run_source(f"plot(1:3); print('-dpng', '{d}/out'); "
                 f"exportgraphics(gcf, '{d}/out2.svg');", "t")
    assert os.path.exists(f"{d}/out.png")
    assert os.path.exists(f"{d}/out2.svg")
