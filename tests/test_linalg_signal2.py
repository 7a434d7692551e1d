"""Linalg batch 2 + signal batch 2."""

import numpy as np

from helpers import run_get


def test_vecnorm():
    v = run_get("a = vecnorm([3 0; 4 0]); b = vecnorm([1 2 3], 1, 2);"
                "c = vecnorm([1 -5 2], Inf, 2);", "a", "b", "c")
    assert np.allclose(v["a"].host(), [[5.0, 0.0]])
    assert v["b"].host()[0, 0] == 6.0
    assert v["c"].host()[0, 0] == 5.0


def test_mpower_pagemtimes():
    v = run_get("p = mpower([1 1; 0 1], 3); q = pagemtimes([1 2; 3 4], [1 0; 0 1]);",
                "p", "q")
    assert v["p"].host().tolist() == [[1.0, 3.0], [0.0, 1.0]]
    assert v["q"].host().tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_pagemtimes_batched():
    src = ("A = zeros(2,2,2); A(:,:,1) = [1 0; 0 1]; A(:,:,2) = [2 0; 0 2];"
           "B = zeros(2,2,2); B(:,:,1) = [1 2; 3 4]; B(:,:,2) = [1 1; 1 1];"
           "C = pagemtimes(A, B);")
    v = run_get(src, "C")
    c = v["C"].host()
    assert c.shape == (2, 2, 2)
    assert c[:, :, 0].tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert c[:, :, 1].tolist() == [[2.0, 2.0], [2.0, 2.0]]


def test_pagetranspose():
    v = run_get("T = pagetranspose([1 2; 3 4]);", "T")
    assert v["T"].host().tolist() == [[1.0, 3.0], [2.0, 4.0]]


def test_rref():
    v = run_get("[R, p] = rref([1 2 3; 4 5 6; 7 8 9]);", "R", "p")
    r = v["R"].host()
    assert np.allclose(r[2, :], 0.0)
    assert np.allclose(r[:2, :2], np.eye(2))
    assert v["p"].host().tolist() == [[1.0, 2.0]]


def test_eigs_dense():
    v = run_get("d = eigs(diag([1 5 3 2]), 2);", "d")
    assert v["d"].host().reshape(-1).tolist() == [5.0, 3.0]


def test_lscov():
    v = run_get("A = [1 0; 1 1; 1 2]; b = [1; 2; 3]; x = lscov(A, b);", "x")
    assert np.allclose(v["x"].host().reshape(-1), [1.0, 1.0])


def test_symrcm():
    v = run_get("p = symrcm([1 0 0 1; 0 1 1 0; 0 1 1 0; 1 0 0 1]);", "p")
    p = v["p"].host().reshape(-1)
    assert sorted(p.tolist()) == [1.0, 2.0, 3.0, 4.0]


def test_decomposition_solve():
    v = run_get("A = [4 1; 1 3]; dA = decomposition(A); b = [1; 2];"
                "x = dA \\ b; y = A \\ b; ill = isIllConditioned(dA);",
                "x", "y", "ill")
    assert np.allclose(v["x"].host(), v["y"].host())
    assert not v["ill"].host()[0, 0]


def test_decomposition_mrdivide():
    v = run_get("A = [2 0; 0 4]; dA = decomposition(A); r = [2 4] / dA;", "r")
    assert np.allclose(v["r"].host(), [[1.0, 1.0]])


def test_butter_filtfilt():
    v = run_get("[b, a] = butter(2, 0.3); y = filtfilt(b, a, [1 2 3 4 5 6 7 8 9 10]);",
                "b", "a", "y")
    assert v["b"].size == 3 and v["a"].size == 3
    # zero-phase filtering of a ramp stays close to the ramp interior
    y = v["y"].host().reshape(-1)
    assert abs(y[5] - 6.0) < 0.3


def test_buttord():
    v = run_get("[n, wn] = buttord(0.2, 0.4, 1, 40);", "n", "wn")
    assert v["n"].host()[0, 0] >= 4
    assert 0.2 <= v["wn"].host().reshape(-1)[0] <= 0.4


def test_fir1():
    v = run_get("b = fir1(10, 0.5);", "b")
    b = v["b"].host().reshape(-1)
    assert b.size == 11
    assert abs(b.sum() - 1.0) < 1e-6   # unity DC gain for lowpass


def test_rate_conversion():
    v = run_get("d = downsample([1 2 3 4 5 6], 2); u = upsample([1 2], 3);"
                "r = resample([1 2 3 4], 2, 1);", "d", "u", "r")
    assert v["d"].host().tolist() == [[1.0, 3.0, 5.0]]
    assert v["u"].host().tolist() == [[1.0, 0.0, 0.0, 2.0, 0.0, 0.0]]
    assert v["r"].size == 8


def test_generators():
    v = run_get("s = square([0.1 pi+0.1]); w = sawtooth(pi); r = rectpuls(0);"
                "t = tripuls(0); g = gauspuls(0);", "s", "w", "r", "t", "g")
    assert v["s"].host().tolist() == [[1.0, -1.0]]
    assert abs(v["w"].host()[0, 0]) < 1e-9   # sawtooth crosses 0 at pi (width 1 -> ramp)
    assert v["r"].host()[0, 0] == 1.0
    assert v["t"].host()[0, 0] == 1.0
    assert v["g"].host()[0, 0] == 1.0


def test_pulstran_periodogram():
    v = run_get("t = 0 : 0.1 : 1; y = pulstran(t, 0.5, 'rectpuls', 0.2);"
                "[p, f] = periodogram(sin(2*pi*0.25*(0:63)), [], 64, 1);",
                "y", "p", "f")
    y = v["y"].host().reshape(-1)
    assert y[5] == 1.0 and y[0] == 0.0
    p, f = v["p"].host().reshape(-1), v["f"].host().reshape(-1)
    assert f[np.argmax(p)] == 0.25
