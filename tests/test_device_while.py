"""Device while-loop idiom: whole `while` loops compile to one
lax.while_loop when condition+body are pure device math; anything else
falls back to plain interpretation with identical semantics."""

import numpy as np

from helpers import run_get
from runmat_tpu.accel import active_engine
from runmat_tpu.session import Session


def _run_with_stats(src):
    s = Session(accelerate=True)
    r = s.execute(src)
    assert r.error is None, r.error
    return s, dict(active_engine().stats)


def test_device_while_single_dispatch():
    s, _stats = _run_with_stats(
        "x = gpuArray(ones(1000, 1, 'single'));"
        "err = gpuArray(single(1.0)); k = single(0);\n"
        "while err > 1e-3\n"
        "  x = x * single(0.5);\n"
        "  err = max(abs(x), [], 'all');\n"
        "  k = k + 1;\n"
        "end\n"
        "y = gather(err); kk = gather(k);")
    assert abs(s.get("y").host()[0, 0] - 0.5 ** 10) < 1e-9
    assert s.get("kk").host()[0, 0] == 10.0


def test_device_while_matches_interpreter():
    # v converges to the fixed point of sqrt(v) + 0.1 (~1.191558)
    body = ("e = gpuArray(single(1.0)); v = gpuArray(single(2.0)); n = single(0);\n"
            "while e > 0.01\n"
            "  vn = sqrt(v) + single(0.1);\n"
            "  e = abs(vn - v);\n"
            "  v = vn;\n"
            "  n = n + 1;\n"
            "end\n"
            "r = gather(v); nn = gather(n);")
    s1 = Session(accelerate=True)
    assert s1.execute(body).error is None
    # reference: pure host (no engine)
    s2 = Session(accelerate=False)
    host_body = body.replace("gpuArray(single(1.0))", "single(1.0)") \
                    .replace("gpuArray(single(2.0))", "single(2.0)") \
                    .replace("gather(v)", "v").replace("gather(n)", "n")
    assert s2.execute(host_body).error is None
    assert np.allclose(s1.get("r").host(), s2.get("r").host(), rtol=1e-6)
    assert s1.get("nn").host()[0, 0] == s2.get("nn").host()[0, 0]


def test_zero_trip_while():
    v = run_get("x = gpuArray(single(5)); w = single(7);\n"
                "while x > 100\n  w = w * 2; x = x * 2;\nend\n"
                "y = gather(w);", "y", accelerate=True)
    assert v["y"].host()[0, 0] == 7.0   # loop never ran; w unchanged


def test_while_with_break_falls_back():
    v = run_get("x = single(0); k = 0;\n"
                "while true\n  x = x + 1; k = k + 1;\n"
                "  if k >= 3, break; end\nend\n", "x", "k", accelerate=True)
    assert v["x"].host()[0, 0] == 3.0
    assert v["k"].host()[0, 0] == 3.0


def test_while_with_host_side_effect_falls_back():
    s = Session(accelerate=True)
    r = s.execute("n = 0;\nwhile n < 3\n  n = n + 1; q = sprintf('%d', n);\nend")
    assert r.error is None
    assert s.get("n").host()[0, 0] == 3.0
    assert s.get("q").to_str() == "3"
