"""Introspection batch 2 + timing: inputParser, onCleanup, memoize, metaclass,
clearvars, timer, timeit."""

import time

import numpy as np

from helpers import fails, run, run_get


def test_inputparser_basic():
    v = run_get(
        "p = inputParser;"
        "p.addRequired('x');"
        "p.addOptional('y', 10);"
        "p.addParameter('scale', 2);"
        "p.parse(5, 'scale', 7);"
        "r = p.Results; d = p.UsingDefaults;", "r", "d")
    r = v["r"]
    assert r.get_scalar_field("x").host()[0, 0] == 5.0
    assert r.get_scalar_field("y").host()[0, 0] == 10.0
    assert r.get_scalar_field("scale").host()[0, 0] == 7.0
    assert [e.to_str() for e in v["d"].data.reshape(-1)] == ["y"]


def test_inputparser_validation_and_unmatched():
    fails("p = inputParser; p.addRequired('x', @(v) v > 0); p.parse(-1);",
          "ArgumentFailedValidation")
    fails("p = inputParser; p.parse('bogus', 1);", "UnmatchedParameter")
    v = run_get("p = inputParser; p.KeepUnmatched = true;"
                "p.parse('extra', 42); u = p.Unmatched;", "u")
    assert v["u"].get_scalar_field("extra").host()[0, 0] == 42.0


def test_inputparser_function_forms():
    v = run_get("p = inputParser; addParameter(p, 'k', 3); parse(p, 'k', 9);"
                "r = p.Results;", "r")
    assert v["r"].get_scalar_field("k").host()[0, 0] == 9.0


def test_oncleanup_fires_on_clear():
    s = run("g = 0; function setg(), end;")  # warm session
    s = run("globalflag = 0;")
    # cleanup runs when the guard is cleared
    s2 = run("x = 0; c = onCleanup(@() disp('cleanup-ran')); clear c;")
    # output captured by execute; just ensure no error. Stronger check below.
    r = s2.execute("disp('after')")
    assert r.error is None


def test_memoize():
    v = run_get(
        "calls = 0;"
        "f = memoize(@sin);"
        "a = f(1.0); b = f(1.0); st = f.stats();", "a", "b", "st")
    assert abs(v["a"].host()[0, 0] - np.sin(1.0)) < 1e-15
    assert v["a"].host()[0, 0] == v["b"].host()[0, 0]
    cache = v["st"].get_scalar_field("Cache")
    assert cache.get_scalar_field("HitCount").host()[0, 0] == 1.0
    assert cache.get_scalar_field("MissCount").host()[0, 0] == 1.0


def test_metaclass_superclasses():
    src = ("m = metaclass(5); n = m.Name;")
    v = run_get(src, "n")
    assert v["n"].to_str() == "double"


def test_iskeyword_namelengthmax_ver():
    v = run_get("a = iskeyword('for'); b = iskeyword('banana');"
                "n = namelengthmax; o = verLessThan('matlab', '99.1');"
                "p = verLessThan('matlab', '1.0');", "a", "b", "n", "o", "p")
    assert v["a"].host()[0, 0] and not v["b"].host()[0, 0]
    assert v["n"].host()[0, 0] == 63.0
    assert v["o"].host()[0, 0] and not v["p"].host()[0, 0]


def test_underlying_type():
    v = run_get("t = underlyingType(single(1)); q = isUnderlyingType(5, 'double');",
                "t", "q")
    assert v["t"].to_str() == "single"
    assert v["q"].host()[0, 0]


def test_clearvars():
    s = run("a = 1; b = 2; keepme = 3; clearvars -except keepme;")
    assert s.get("a") is None and s.get("b") is None
    assert s.get("keepme") is not None
    s2 = run("ab = 1; ac = 2; b = 3; clearvars a*;")
    assert s2.get("ab") is None and s2.get("ac") is None
    assert s2.get("b") is not None


def test_dbstack_mlock():
    v = run_get("s = dbstack; L = mislocked;", "s", "L")
    assert v["s"].shape[0] >= 1
    assert not v["L"].host()[0, 0]


def test_timeit():
    v = run_get("t = timeit(@() sum(1:100));", "t")
    t = v["t"].host()[0, 0]
    assert 0 <= t < 1.0


def test_timer_singleshot():
    s = run("hits = 0;"
            "t = timer('StartDelay', 0, 'TimerFcn', @(o, e) disp('tick'));"
            "t.start(); t.wait(); r = t.Running; n = t.TasksExecuted;"
            "t.delete();")
    assert s.get("r").to_str() == "off"
    assert s.get("n").host()[0, 0] == 1.0


def test_timer_periodic_and_find():
    s = run("t = timer('ExecutionMode', 'fixedRate', 'Period', 0.01, "
            "'TasksToExecute', 3, 'Name', 'mytimer', 'TimerFcn', @(o,e) 0);"
            "t.start(); t.wait(); n = t.TasksExecuted;"
            "f = timerfind('Name', 'mytimer'); fn = f.Name; t.delete();")
    assert s.get("n").host()[0, 0] == 3.0
    assert s.get("fn").to_str() == "mytimer"


def test_profiler():
    from helpers import run, run_get
    v = run_get("profile on; x = sin(rand(10)); s = mysum3(x);"
                "profile off; info = profile('info');"
                "t = info.FunctionTable; n = size(t, 1);"
                "function y = mysum3(x), y = sum(x(:)); end",
                "n", "t")
    assert v["n"].host()[0, 0] >= 3
    names = [v["t"].fields["FunctionName"][i, 0].to_str()
             for i in range(int(v["n"].host()[0, 0]))]
    assert "sin" in names and "mysum3" in names
    calls = {nm: v["t"].fields["NumCalls"][i, 0].host()[0, 0]
             for i, nm in enumerate(names)}
    assert calls["mysum3"] == 1.0


def test_imwrite_jpeg(tmp_path):
    from helpers import run_get
    p = tmp_path / "img.jpg"
    v = run_get(f"imwrite(uint8(128*ones(8, 8, 3)), '{p}');"
                f"img = imread('{p}'); s = size(img);", "s", "img")
    assert v["s"].host().reshape(-1)[:2].tolist() == [8.0, 8.0]
    import numpy as np
    assert abs(float(np.mean(v["img"].host())) - 128) < 4  # jpeg lossy
