"""Tier D2: option-surface conformance for the long-tail modules VERDICT r2
called out (io2 / stats2 / table2 / strings2 / datetime): every assertion
pins a documented option combination with an independent oracle."""

import json
import math

import numpy as np

from runmat_tpu.session import Session
from runmat_tpu.values import CellArray, MatArray, StringArray, text_of

ASSERT = {"count": 0}


def bump(n=1):
    ASSERT["count"] += n


_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=False)
    return _SESS


def ev(expr: str):
    s = sess()
    r = s.execute(f"__d2 = {expr};")
    if r.error is not None:
        raise AssertionError(f"{expr} -> {r.error}")
    return s.get("__d2")


def ev_str(expr: str) -> str:
    v = ev(expr)
    if isinstance(v, StringArray):
        return v.item()
    return v.to_str()


def ev_num(expr: str) -> np.ndarray:
    return np.asarray(ev(expr).host())


def run_src(src: str):
    r = sess().execute(src)
    assert r.error is None, (src, r.error)


# ------------------------------------------------------------------ regexp

def test_regexp_option_grid():
    cases = [
        ("regexp('ab12cd34', '\\d+', 'match')", ["12", "34"]),
        ("regexp('ab12cd34', '\\d+', 'once', 'match')", "12"),
        ("regexp('a1b2', '[a-z]', 'match')", ["a", "b"]),
        ("regexpi('AbC', 'b', 'match')", ["b"]),
    ]
    for expr, want in cases:
        v = ev(expr)
        if isinstance(want, list):
            assert isinstance(v, CellArray), expr
            got = [text_of(e) for e in v.data.reshape(-1, order="F")]
            assert got == want, (expr, got)
        else:
            assert ev_str(expr) == want, expr
        bump()
    # start indices (default output) are 1-based
    got = ev_num("regexp('xx12xx34', '\\d\\d')").reshape(-1)
    np.testing.assert_allclose(got, [3, 7])
    bump()
    # tokens
    run_src("__t = regexp('k=v', '(\\w+)=(\\w+)', 'tokens');")
    t = sess().get("__t")
    assert isinstance(t, CellArray)
    inner = t.data.reshape(-1, order="F")[0]
    vals = [text_of(e) for e in inner.data.reshape(-1, order="F")]
    assert vals == ["k", "v"]
    bump()
    # split / names
    run_src("__p = regexp('a,b;c', '[,;]', 'split');")
    p = sess().get("__p")
    got = [text_of(e) for e in p.data.reshape(-1, order="F")]
    assert got == ["a", "b", "c"]
    bump()


# ------------------------------------------------------------------ datetime

def test_datetime_component_grid():
    run_src("__dt = datetime(2024, 3, 15, 13, 45, 30);")
    for fn, want in [("year", 2024), ("month", 3), ("day", 15),
                     ("hour", 13), ("minute", 45), ("second", 30)]:
        got = float(ev_num(f"{fn}(__dt)").reshape(-1)[0])
        assert got == want, fn
        bump()
    # weekday: 2024-03-15 is a Friday (MATLAB: 1=Sunday -> 6)
    got = float(ev_num("weekday(__dt)").reshape(-1)[0])
    assert got == 6.0
    bump()
    # day-of-year
    got = float(ev_num("day(__dt, 'dayofyear')").reshape(-1)[0])
    assert got == 75.0
    bump()


def test_datetime_arithmetic_grid():
    run_src("__a = datetime(2024, 1, 31); __b = datetime(2024, 3, 1);")
    got = float(ev_num("days(__b - __a)").reshape(-1)[0])
    assert got == 30.0           # 2024 is a leap year
    bump()
    got = float(ev_num("day(__a + days(1))").reshape(-1)[0])
    assert got == 1.0
    bump()
    got = float(ev_num("month(__a + days(1))").reshape(-1)[0])
    assert got == 2.0
    bump()
    # duration constructors agree
    for expr, want_s in [("seconds(90)", 90.0), ("minutes(2)", 120.0),
                         ("hours(1.5)", 5400.0), ("days(0.5)", 43200.0)]:
        got = float(ev_num(f"seconds({expr})").reshape(-1)[0])
        assert got == want_s, expr
        bump()
    # leap-year grid
    for y, want in [(2000, 1), (1900, 0), (2024, 1), (2023, 0), (2100, 0)]:
        run_src(f"__ly = day(datetime({y}, 2, 28) + days(1));")
        got = float(np.asarray(sess().get("__ly").host()).reshape(-1)[0])
        assert got == (29.0 if want else 1.0), y
        bump()


# ------------------------------------------------------------------- table

def test_table_option_grid():
    run_src("Age = [38; 43; 21]; W = [71.2; 80.1; 64.0]; "
            "Names = {'Al'; 'Bo'; 'Cy'}; "
            "T = table(Age, W, Names);")
    assert float(ev_num("height(T)").reshape(-1)[0]) == 3.0
    assert float(ev_num("width(T)").reshape(-1)[0]) == 3.0
    bump(2)
    # dot access + row slicing + variable subset
    np.testing.assert_allclose(ev_num("T.Age").reshape(-1), [38, 43, 21])
    bump()
    assert float(ev_num("T{2, 'Age'}").reshape(-1)[0]) == 43.0
    bump()
    run_src("T2 = T(2:3, :);")
    assert float(ev_num("height(T2)").reshape(-1)[0]) == 2.0
    bump()
    # sortrows on a variable, ascending + descending
    run_src("Ts = sortrows(T, 'Age');")
    np.testing.assert_allclose(ev_num("Ts.Age").reshape(-1), [21, 38, 43])
    bump()
    run_src("Td = sortrows(T, 'Age', 'descend');")
    np.testing.assert_allclose(ev_num("Td.Age").reshape(-1), [43, 38, 21])
    bump()
    # summary-style reductions through dot access
    assert float(ev_num("mean(T.W)").reshape(-1)[0]) == \
        float(np.mean([71.2, 80.1, 64.0]))
    bump()
    # addvars / removevars
    run_src("T3 = addvars(T, [1; 2; 3], 'NewVariableNames', 'Idx');")
    assert float(ev_num("width(T3)").reshape(-1)[0]) == 4.0
    bump()
    run_src("T4 = removevars(T3, 'Idx');")
    assert float(ev_num("width(T4)").reshape(-1)[0]) == 3.0
    bump()


# ---------------------------------------------------------------------- io

def test_csv_roundtrip_options(tmp_path):
    p = (tmp_path / "m.csv").as_posix()
    run_src(f"M = [1.5 2.25; 3 4]; writematrix(M, '{p}');")
    got = ev_num(f"readmatrix('{p}')")
    np.testing.assert_allclose(got, [[1.5, 2.25], [3, 4]])
    bump()
    # csvwrite/csvread legacy pair
    p2 = (tmp_path / "l.csv").as_posix()
    run_src(f"csvwrite('{p2}', [9 8; 7 6]);")
    np.testing.assert_allclose(ev_num(f"csvread('{p2}')"), [[9, 8], [7, 6]])
    bump()
    # dlmwrite with delimiter option
    p3 = (tmp_path / "d.txt").as_posix()
    run_src(f"dlmwrite('{p3}', [1 2; 3 4], 'delimiter', ';');")
    raw = open(p3).read()
    assert ";" in raw
    np.testing.assert_allclose(ev_num(f"dlmread('{p3}', ';')"),
                               [[1, 2], [3, 4]])
    bump(2)


def test_json_roundtrip_options(tmp_path):
    run_src("__s = jsonencode(struct('a', 1, 'b', [1 2 3]));")
    enc = ev_str("__s")
    obj = json.loads(enc)
    assert obj["a"] == 1 and obj["b"] == [1, 2, 3]
    bump()
    run_src("__d = jsondecode('{\"x\": [1, 2], \"y\": \"hi\"}');")
    np.testing.assert_allclose(ev_num("__d.x").reshape(-1), [1, 2])
    assert ev_str("__d.y") == "hi"
    bump(2)
    # scalars, nested, logical
    assert ev_str("jsonencode(true)") == "true"
    assert ev_str("jsonencode('txt')") == '"txt"'
    bump(2)


def test_mat_roundtrip_options(tmp_path):
    p = (tmp_path / "w.mat").as_posix()
    run_src(f"av = [1 2; 3 4]; bv = 'text'; cv = single(7); "
            f"save('{p}', 'av', 'bv', 'cv');")
    run_src("clear av bv cv;")
    run_src(f"load('{p}');")
    np.testing.assert_allclose(ev_num("av"), [[1, 2], [3, 4]])
    assert ev_str("bv") == "text"
    assert ev_str("class(cv)") == "single"
    bump(3)
    # selective load
    run_src("clear av bv cv;")
    run_src(f"load('{p}', 'av');")
    np.testing.assert_allclose(ev_num("av"), [[1, 2], [3, 4]])
    r = sess().execute("__zz = bv;")
    assert r.error is not None          # bv was not loaded
    bump(2)


# ------------------------------------------------------------------- stats2

def test_distribution_grids():
    # normcdf/norminv round trip over a p-grid
    for p in (0.025, 0.16, 0.5, 0.84, 0.975):
        x = float(ev_num(f"norminv({p})").reshape(-1)[0])
        back = float(ev_num(f"normcdf({x})").reshape(-1)[0])
        assert abs(back - p) < 1e-9, p
        bump()
    # with mu/sigma options
    assert abs(float(ev_num("norminv(0.5, 7, 3)").reshape(-1)[0]) - 7) < 1e-12
    bump()
    got = float(ev_num("normpdf(0)").reshape(-1)[0])
    assert abs(got - 1 / math.sqrt(2 * math.pi)) < 1e-12
    bump()
    # binopdf exact values
    for (k, n, p, want) in [(0, 3, 0.5, 0.125), (1, 3, 0.5, 0.375),
                            (2, 2, 0.25, 0.0625)]:
        got = float(ev_num(f"binopdf({k}, {n}, {p})").reshape(-1)[0])
        assert abs(got - want) < 1e-12, (k, n, p)
        bump()
    # poisspdf
    got = float(ev_num("poisspdf(2, 3)").reshape(-1)[0])
    assert abs(got - (math.exp(-3) * 9 / 2)) < 1e-12
    bump()
    # zscore normalizes exactly
    run_src("__z = zscore([2 4 6 8]);")
    z = ev_num("__z").reshape(-1)
    assert abs(z.mean()) < 1e-12 and abs(z.std(ddof=1) - 1) < 1e-12
    bump()


def test_movwindow_option_grid():
    x = np.array([1.0, 3, 5, 7, 9, 11])
    # centered windows with shrinking endpoints (MATLAB default)
    for fn, red in [("movmean", np.mean), ("movsum", np.sum),
                    ("movmax", np.max), ("movmin", np.min),
                    ("movmedian", np.median)]:
        for k in (3, 5):
            got = ev_num(f"{fn}([1 3 5 7 9 11], {k})").reshape(-1)
            want = []
            half = (k - 1) // 2
            for i in range(len(x)):
                lo = max(0, i - half)
                hi = min(len(x), i + (k - half))
                want.append(red(x[lo:hi]))
            np.testing.assert_allclose(got, want, err_msg=f"{fn} {k}")
            bump()
    # 'Endpoints','discard' drops partial windows
    got = ev_num("movmean([1 3 5 7 9 11], 3, 'Endpoints', 'discard')") \
        .reshape(-1)
    np.testing.assert_allclose(got, [3, 5, 7, 9])
    bump()


def test_option_battery2_total():
    print(f"\ntier-D2 assertions: {ASSERT['count']}")
    assert ASSERT["count"] >= 50


def test_histcounts_normalization_grid():
    data = "[1 2 2 3 3 3 9]"
    edges = "[0 2 4 10]"
    base = ev_num(f"histcounts({data}, {edges})").reshape(-1)
    np.testing.assert_allclose(base, [1, 5, 1])
    bump()
    got = ev_num(f"histcounts({data}, {edges}, "
                 f"'Normalization', 'probability')").reshape(-1)
    np.testing.assert_allclose(got, base / 7.0)
    bump()
    got = ev_num(f"histcounts({data}, {edges}, "
                 f"'Normalization', 'cumcount')").reshape(-1)
    np.testing.assert_allclose(got, np.cumsum(base))
    bump()
    got = ev_num(f"histcounts({data}, {edges}, "
                 f"'Normalization', 'cdf')").reshape(-1)
    np.testing.assert_allclose(got, np.cumsum(base) / 7.0)
    bump()
    got = ev_num(f"histcounts({data}, {edges}, "
                 f"'Normalization', 'pdf')").reshape(-1)
    widths = np.array([2.0, 2.0, 6.0])
    np.testing.assert_allclose(got, base / (7.0 * widths))
    bump()
    # BinWidth option controls the edge grid
    run_src("[__c, __e] = histcounts([0.1 0.9 1.1 1.9], 'BinWidth', 1);")
    e = np.asarray(sess().get("__e").host()).reshape(-1)
    assert abs((e[1] - e[0]) - 1.0) < 1e-12
    bump()
