"""Breadth batch 4: missing-data family, moving stats, relational forms,
elementwise extras, comms codecs, sorted-set tests."""

import numpy as np
import pytest

from helpers import run_get


def test_relational_function_forms():
    v = run_get("r = eq([1 2 3],[1 0 3]); s = lt(2,3); t = ge([1 2],[2 2]);",
                "r", "s", "t")
    assert v["r"].host().tolist() == [[True, False, True]]
    assert v["s"].host().tolist() == [[True]]
    assert v["t"].host().tolist() == [[False, True]]


def test_ismissing_rmmissing():
    v = run_get("m = ismissing([1 NaN 3]); r = rmmissing([1 NaN 3]);", "m", "r")
    assert v["m"].host().tolist() == [[False, True, False]]
    assert v["r"].host().tolist() == [[1.0, 3.0]]


def test_rmmissing_matrix_rows():
    v = run_get("r = rmmissing([1 2; NaN 4; 5 6]);", "r")
    assert v["r"].host().tolist() == [[1.0, 2.0], [5.0, 6.0]]


def test_fillmissing_modes():
    v = run_get(
        "a = fillmissing([1 NaN 3], 'constant', 9);"
        "b = fillmissing([1 NaN NaN 4], 'linear');"
        "c = fillmissing([1 NaN 3], 'previous');",
        "a", "b", "c")
    assert v["a"].host().tolist() == [[1.0, 9.0, 3.0]]
    assert np.allclose(v["b"].host(), [[1.0, 2.0, 3.0, 4.0]])
    assert v["c"].host().tolist() == [[1.0, 1.0, 3.0]]


def test_standardize_and_anymissing():
    v = run_get("s = standardizeMissing([1 -99 3], -99); a = anymissing(s);"
                "f = allfinite([1 2 3]);", "s", "a", "f")
    assert np.isnan(v["s"].host()[0, 1])
    assert v["a"].host()[0, 0]
    assert v["f"].host()[0, 0]


def test_nan_family():
    v = run_get("x = [1 NaN 3]; s = nansum(x); m = nanmean(x); "
                "mx = nanmax(x); mn = nanmin(x);", "s", "m", "mx", "mn")
    assert v["s"].host()[0, 0] == 4.0
    assert v["m"].host()[0, 0] == 2.0
    assert v["mx"].host()[0, 0] == 3.0
    assert v["mn"].host()[0, 0] == 1.0


def test_moving_extras():
    v = run_get("a = movmedian([1 2 3 4 5], 3); b = movprod([1 2 3], 2);"
                "c = movvar([1 2 3 4], 2);", "a", "b", "c")
    assert v["a"].host().tolist() == [[1.5, 2.0, 3.0, 4.0, 4.5]]
    assert v["b"].host().tolist() == [[1.0, 2.0, 6.0]]
    assert np.allclose(v["c"].host(), [[0.0, 0.5, 0.5, 0.5]])


def test_maxk_mink_bounds():
    v = run_get("[a, ia] = maxk([3 1 4 1 5], 2); b = mink([3 1 4], 1);"
                "[lo, hi] = bounds([3 1 4 1 5]);", "a", "ia", "b", "lo", "hi")
    assert v["a"].host().tolist() == [[5.0, 4.0]]
    assert v["ia"].host().tolist() == [[5.0, 3.0]]
    assert v["b"].host().tolist() == [[1.0]]
    assert v["lo"].host()[0, 0] == 1.0 and v["hi"].host()[0, 0] == 5.0


def test_elementwise_extras():
    v = run_get("h = heaviside([-2 0 3]); r = realsqrt(4); "
                "s = rescale([0 5 10]); sp = sinpi(1); cp = cospi(0.5);",
                "h", "r", "s", "sp", "cp")
    assert v["h"].host().tolist() == [[0.0, 0.5, 1.0]]
    assert v["r"].host()[0, 0] == 2.0
    assert v["s"].host().tolist() == [[0.0, 0.5, 1.0]]
    assert v["sp"].host()[0, 0] == 0.0
    assert v["cp"].host()[0, 0] == 0.0


def test_realsqrt_error():
    from runmat_tpu.errors import MatError
    with pytest.raises(MatError):
        run_get("r = realsqrt(-1);", "r")


def test_bsxfun_repelem():
    v = run_get("b = bsxfun(@plus, [1;2], [10 20]); r = repelem([1 2], 3);"
                "m = repelem([1 2; 3 4], 2, 1);", "b", "r", "m")
    assert v["b"].host().tolist() == [[11.0, 21.0], [12.0, 22.0]]
    assert v["r"].host().tolist() == [[1.0, 1.0, 1.0, 2.0, 2.0, 2.0]]
    assert v["m"].host().tolist() == [[1.0, 2.0], [1.0, 2.0], [3.0, 4.0], [3.0, 4.0]]


def test_peaks_filter2():
    v = run_get("z = peaks(5); f = filter2(ones(3)/9, ones(4));", "z", "f")
    assert v["z"].shape == (5, 5)
    assert v["f"].shape == (4, 4)
    assert abs(v["f"].host()[1, 1] - 1.0) < 1e-12


def test_de2bi_bi2de_roundtrip():
    v = run_get("b = de2bi([5; 3], 4); d = bi2de(b);", "b", "d")
    assert v["b"].host().tolist() == [[1.0, 0.0, 1.0, 0.0], [1.0, 1.0, 0.0, 0.0]]
    assert v["d"].host().tolist() == [[5.0], [3.0]]


def test_sorted_set_utils():
    v = run_get("i = argsort([3 1 2]); s = issortedrows([1 2; 3 4]);"
                "[m, loc] = ismembertol([1.0000001 5], [1 2 3]);",
                "i", "s", "m", "loc")
    assert v["i"].host().tolist() == [[2.0, 3.0, 1.0]]
    assert v["s"].host()[0, 0]
    assert v["m"].host().tolist() == [[True, False]]
    assert v["loc"].host().tolist() == [[1.0, 0.0]]
