"""Plotting batch 2: handle graphics, axes commands, plot-command tail."""

import numpy as np

from helpers import run, run_get


def test_get_set_axes():
    s = run("plot([1 2 3], [4 5 6]); ax = gca;"
            "set(ax, 'XLim', [0 10], 'Title', 'mine');"
            "xl = get(ax, 'XLim'); t = get(ax, 'Title');")
    assert s.get("xl").host().tolist() == [[0.0, 10.0]]
    assert s.get("t").to_str() == "mine"


def test_get_line_props():
    s = run("h = line([1 2], [3 4]); y = get(h, 'YData');"
            "set(h, 'YData', [7 8]); y2 = get(h, 'YData');")
    assert s.get("y").host().tolist() == [[3.0, 4.0]]
    assert s.get("y2").host().tolist() == [[7.0, 8.0]]


def test_findobj_isgraphics():
    s = run("clf; plot(1:3, 1:3); h = findobj(gca, 'Type', 'line');"
            "q = isgraphics(gca); r = isgraphics(5);")
    assert s.get("h").size >= 1
    assert s.get("q").host()[0, 0]


def test_ancestor():
    s = run("clf; h = line([0 1], [0 1]); ax = ancestor(h, 'axes');"
            "f = ancestor(h, 'figure'); t = get(ax, 'Type');")
    assert s.get("t").to_str() == "axes"


def test_axes_commands():
    s = run("clf; plot(1:3); box on; xticks([1 2 3]); xticklabels({'a','b','c'});"
            "xscale('log'); xt = xticks; lbl = xticklabels;"
            "sgtitle('top'); caxis([0 2]); c = caxis;")
    assert s.get("xt").host().tolist() == [[1.0, 2.0, 3.0]]
    assert [e.to_str() for e in s.get("lbl").data.reshape(-1)] == ["a", "b", "c"]
    assert s.get("c").host().tolist() == [[0.0, 2.0]]


def test_xline_yline_sphere():
    s = run("clf; plot(0:10, 0:10); xline(5); yline(2);"
            "[X, Y, Z] = sphere(8);")
    assert s.get("X").shape == (9, 9)
    r = np.sqrt(s.get("X").host()**2 + s.get("Y").host()**2 + s.get("Z").host()**2)
    assert np.allclose(r, 1.0)


def test_hist_and_polar():
    s = run("[c, x] = hist([1 1 2 9], 3);"
            "polarplot(linspace(0, 2*pi, 20), ones(1, 20));")
    assert s.get("c").host().reshape(-1).sum() == 4.0


def test_patch_triplot_quiver3():
    s = run("clf; patch([0 1 1], [0 0 1], 'r');"
            "triplot([1 2 3], [0 1 0], [0 0 1]);"
            "quiver3(0, 0, 0, 1, 1, 1);")
    assert s is not None


def test_animatedline():
    s = run("h = animatedline; addpoints(h, 1, 2); addpoints(h, [3 4], [5 6]);"
            "x = get(h, 'XData');")
    assert s.get("x").host().reshape(-1).tolist() == [1.0, 3.0, 4.0]


def test_savefig_openfig(tmp_path):
    p = tmp_path / "f.fig"
    s = run(f"clf; plot([1 2 3], [2 4 6]); savefig('{p}');"
            f"g = openfig('{p}'); ch = get(get(g, 'Children'){{1}}, 'Children');")
    assert s.get("ch").size == 1


def test_fsurf_fcontour_heatmap():
    s = run("fcontour(@(x, y) x.^2 + y.^2, [-1 1]);"
            "fsurf(@(x, y) x + y, [-1 1]);"
            "heatmap(magic(4));")
    assert s is not None


def test_plotmatrix_stackedplot_wordcloud():
    s = run("plotmatrix(randn(10, 2));"
            "stackedplot([1 2; 3 4; 5 6]);"
            "wordcloud({'alpha', 'beta'}, [5 1]);"
            "w = waitbar(0.5);")
    assert s is not None


def test_html_interactive_export(tmp_path):
    p = tmp_path / "fig.html"
    run(f"clf; plot(1:10, (1:10).^2); exportgraphics(gcf, '{p}');")
    html = p.read_text()
    assert "<svg" in html and "wheel" in html and "translate" in html
