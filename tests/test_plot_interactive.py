"""Interactive plotting depth (VERDICT r2 #3): 3-D orbit, data cursors,
live-update long poll, per-plot-type SVG fidelity, single-gather device
rendering (≙ runmat-plot/src/{gui,plots}/)."""

import json
import threading
import time

import numpy as np

from helpers import run
from runmat_tpu.server import handle_request
from runmat_tpu.session import Session


def _sess(accel=False):
    s = Session(accelerate=accel)
    handle_request(s, {"id": 0, "op": "execute", "source": "close all"})
    return s


def test_view_op_orbits_camera():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "[X, Y] = meshgrid(-2:.5:2); "
                                 "surf(X, Y, X.^2 - Y.^2);"})
    r = handle_request(s, {"id": 2, "op": "figures"})
    assert r["ok"] and r["figures"]
    f = r["figures"][0]
    assert f["is3d"] is True
    assert f["view"] == [-37.5, 30.0]
    svg0 = f["svg"]
    r2 = handle_request(s, {"id": 3, "op": "view", "fig": f["num"],
                            "az": 45.0, "el": 60.0})
    assert r2["ok"] and r2["az"] == 45.0 and r2["el"] == 60.0
    assert r2["svg"] != svg0          # camera move re-renders the scene
    # el clamps to the pole
    r3 = handle_request(s, {"id": 4, "op": "view", "fig": f["num"],
                            "az": 0.0, "el": 200.0})
    assert r3["el"] == 90.0
    # unknown figure errors cleanly
    r4 = handle_request(s, {"id": 5, "op": "view", "fig": 999})
    assert not r4["ok"]


def test_probe_op_returns_nearest_data_point():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "plot([0 1 2 3], [0 10 5 20]);"})
    num = handle_request(s, {"id": 2, "op": "figures"})["figures"][0]["num"]
    # the default axes box spans x-fractions ~0.13..0.9; probe near the
    # right edge -> nearest vertex must be the last point (3, 20)
    r = handle_request(s, {"id": 3, "op": "probe", "fig": num,
                           "fx": 0.9, "fy": 0.12})
    assert r["ok"] and r["hit"] is not None
    assert r["hit"]["x"] == 3.0 and r["hit"]["y"] == 20.0
    assert r["hit"]["index"] == 4
    # and near the left edge -> the first point
    r2 = handle_request(s, {"id": 4, "op": "probe", "fig": num,
                            "fx": 0.13, "fy": 0.9})
    assert r2["hit"]["x"] == 0.0 and r2["hit"]["y"] == 0.0


def test_probe_3d_returns_z():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "t = 0:0.1:6; plot3(sin(t), cos(t), t);"})
    num = handle_request(s, {"id": 2, "op": "figures"})["figures"][0]["num"]
    r = handle_request(s, {"id": 3, "op": "probe", "fig": num,
                           "fx": 0.5, "fy": 0.5})
    assert r["ok"] and r["hit"] is not None and "z" in r["hit"]


def test_figures_wait_long_poll():
    s = _sess()
    r0 = handle_request(s, {"id": 1, "op": "figures"})
    rev = r0["rev"]
    # no change: times out with changed=False
    t0 = time.monotonic()
    r1 = handle_request(s, {"id": 2, "op": "figures_wait", "rev": rev,
                            "timeout": 0.3})
    assert not r1["changed"] and time.monotonic() - t0 >= 0.25
    # a plot from another thread wakes the poll with the new scene
    def later():
        time.sleep(0.2)
        handle_request(s, {"id": 3, "op": "execute",
                           "source": "plot(1:5, (1:5).^2);"})
    th = threading.Thread(target=later)
    th.start()
    r2 = handle_request(s, {"id": 4, "op": "figures_wait", "rev": rev,
                            "timeout": 10})
    th.join()
    assert r2["changed"] and r2["rev"] != rev
    assert r2["figures"] and "<svg" in r2["figures"][0]["svg"]


def _svg_of(s, src):
    handle_request(s, {"id": 1, "op": "execute", "source": "close all"})
    r = handle_request(s, {"id": 2, "op": "execute", "source": src})
    assert r["ok"], r.get("error")
    figs = handle_request(s, {"id": 3, "op": "figures"})["figures"]
    assert figs, f"no figure from: {src}"
    return figs[0]["svg"]


def test_plot_type_fidelity_battery():
    """Every headline plot type renders substantive geometry (screenshot-
    test analog on the SVG transport: element counts pin the visual
    structure, not just non-emptiness)."""
    s = _sess()
    cases = {
        # src -> (element-substring, minimum count)
        "surf(peaks(12));": ("<polygon", 100),        # filled quads
        "mesh(peaks(12));": ("<polygon", 100),        # edge-colored quads
        "contour(peaks(24));": ("<polyline", 8),      # level curves
        "contourf(peaks(24));": ("<image", 1),        # filled bands raster
        "quiver([0 1], [0 1], [1 1], [0 1]);": ("<polyline", 2),
        "stem(1:8, (1:8).^2);": ("<polyline", 8),
        "stairs(1:8, rand(1,8));": ("<polyline", 1),
        "errorbar(1:6, (1:6).^2, ones(1,6));": ("<polyline", 6),
        "bar(1:5, [3 1 4 1 5]);": ("<polygon", 5),
        "histogram(randn(500,1));": ("<polygon", 5),
        "plot3(sin(0:.1:6), cos(0:.1:6), 0:.1:6);": ("<polyline", 1),
        "pie([1 2 3]);": ("<polygon", 3),
        "area(1:5, [2 4 1 5 3]);": ("<polygon", 1),
        "scatter(rand(20,1), rand(20,1));": ("<circle", 10),
        "imagesc(magic(8));": ("<image", 1),
    }
    for src, (needle, n_min) in cases.items():
        svg = _svg_of(s, src)
        count = svg.count(needle)
        assert count >= n_min, \
            f"{src}: expected >= {n_min} of {needle}, got {count}"
    handle_request(s, {"id": 9, "op": "execute", "source": "close all"})


def test_device_plot_single_gather():
    """Plotting device arrays gathers each operand ONCE (host cache), not
    per render pass — the direct device→raster contract."""
    from runmat_tpu.accel import active_engine, init_engine, reset_engine, set_engine
    prev = active_engine()
    reset_engine()
    eng = init_engine(platform="cpu")
    try:
        s = Session(accelerate=True)
        handle_request(s, {"id": 0, "op": "execute", "source": "close all"})
        handle_request(s, {"id": 1, "op": "execute",
                           "source": "x = gpuArray(linspace(0, 6, 5000)); "
                                     "y = sin(x);"})
        g0 = eng.stats["gathers"]
        handle_request(s, {"id": 2, "op": "execute", "source": "plot(x, y);"})
        handle_request(s, {"id": 3, "op": "figures"})     # render
        handle_request(s, {"id": 4, "op": "figures"})     # re-render
        gathers = eng.stats["gathers"] - g0
        assert gathers <= 2, f"{gathers} gathers for 2 device operands"
        handle_request(s, {"id": 5, "op": "execute", "source": "close all"})
    finally:
        set_engine(prev)


def test_tiledlayout_nexttile_annotation_print(tmp_path):
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "tiledlayout(2, 2); nexttile; plot(1:5); "
                                 "nexttile; plot(5:-1:1); "
                                 "nexttile(4); plot([1 3 2]); "
                                 "annotation('textbox', [0.1 0.1 0.3 0.1], "
                                 "'String', 'note');"})
    figs = handle_request(s, {"id": 2, "op": "figures"})["figures"]
    assert figs
    svg = figs[0]["svg"]
    # three tiles -> three axes frames; annotation text present
    assert svg.count("<svg") == 1
    assert "note" in svg
    p = (tmp_path / "out.png").as_posix()
    r = handle_request(s, {"id": 3, "op": "execute",
                           "source": f"print('{p}', '-dpng');"})
    assert r["ok"]
    import os as _os
    assert _os.path.getsize(p) > 500
    handle_request(s, {"id": 4, "op": "execute", "source": "close all"})


def test_tiledlayout_flow_grows_grid():
    s = _sess()
    handle_request(s, {"id": 1, "op": "execute",
                       "source": "tiledlayout('flow'); nexttile; plot(1); "
                                 "nexttile; plot(2); nexttile; plot(3);"})
    from runmat_tpu.plot import figure as figmod
    f = figmod.current_figure()
    assert len(f.axes) == 3
    handle_request(s, {"id": 2, "op": "execute", "source": "close all"})


def test_run_show_serves_orbitable_figure(tmp_path):
    """`runmat-tpu run demo.m --show` (VERDICT r4 #9): serves the session's
    figures over HTTP with the WebGL client; the scene is orbitable via the
    view op and delivers typed geometry."""
    import re
    import subprocess
    import sys
    import urllib.request

    script = tmp_path / "demo.m"
    script.write_text("[X, Y] = meshgrid(-1:0.5:1);\n"
                      "surf(X, Y, X.*Y);\n")
    port = 8731
    env = dict(__import__("os").environ)
    env["RUNMAT_TPU_PLATFORM"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "runmat_tpu.cli", "run", str(script),
         "--show", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = ""
        for _ in range(200):
            line = proc.stdout.readline()
            if "serving figures" in line:
                break
        m = re.search(r"token=([A-Za-z0-9_-]+)", line)
        assert m, line
        token = m.group(1)

        def api(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api",
                data=json.dumps(payload).encode(),
                headers={"X-Runmat-Token": token,
                         "Content-Type": "application/json"})
            for attempt in range(50):
                try:
                    with urllib.request.urlopen(req, timeout=5) as r:
                        return json.loads(r.read())
                except OSError:
                    time.sleep(0.2)
            raise AssertionError("server never came up")

        figs = api({"id": 1, "op": "figures"})
        assert figs["ok"] and figs["figures"]
        scene = api({"id": 2, "op": "figure_webgl", "fig": 1})
        assert scene["ok"] and scene["scene"]["axes"]
        orb = api({"id": 3, "op": "view", "fig": 1, "az": 45, "el": 30})
        assert orb["ok"] and orb["az"] == 45.0
    finally:
        proc.kill()
        proc.wait(timeout=30)
