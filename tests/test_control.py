"""Control toolbox: tf/ss models, responses, analysis, lqr."""

import numpy as np

from helpers import run_get


def test_tf_arithmetic():
    v = run_get("g = tf([1], [1 1]); h = tf([1], [1 2]);"
                "s = g + h; p = g * h; q = g / h;", "s", "p", "q")
    s, p, q = v["s"], v["p"], v["q"]
    # g+h = (2s+3)/((s+1)(s+2))
    assert np.allclose(s.num, [2.0, 3.0])
    assert np.allclose(s.den, [1.0, 3.0, 2.0])
    assert np.allclose(p.den, [1.0, 3.0, 2.0])
    assert np.allclose(q.num, [1.0, 2.0]) and np.allclose(q.den, [1.0, 1.0])


def test_tf_scalar_ops_uminus():
    v = run_get("g = tf([1], [1 1]); a = 2 * g; b = -g; c = g^2;",
                "a", "b", "c")
    assert np.allclose(v["a"].num, [2.0])
    assert np.allclose(v["b"].num, [-1.0])
    assert np.allclose(v["c"].den, [1.0, 2.0, 1.0])


def test_pole_zero_dcgain_isstable():
    v = run_get("g = tf([1 1], [1 3 2]); p = pole(g); z = zero(g);"
                "k = dcgain(g); st = isstable(g);"
                "u = isstable(tf([1], [1 -1]));", "p", "z", "k", "st", "u")
    assert sorted(np.real(v["p"].host()).reshape(-1).tolist()) == [-2.0, -1.0]
    assert v["z"].host().reshape(-1).tolist() == [-1.0]
    assert abs(v["k"].host()[0, 0] - 0.5) < 1e-12
    assert v["st"].host()[0, 0] and not v["u"].host()[0, 0]


def test_damp():
    v = run_get("[wn, zeta] = damp(tf([1], [1 2 4]));", "wn", "zeta")
    assert np.allclose(v["wn"].host().reshape(-1), [2.0, 2.0])
    assert np.allclose(v["zeta"].host().reshape(-1), [0.5, 0.5])


def test_feedback():
    v = run_get("g = tf([1], [1 1]); c = feedback(g, tf(1));", "c")
    # G/(1+G) = 1/(s+2)
    assert np.allclose(v["c"].num, [1.0])
    assert np.allclose(v["c"].den, [1.0, 2.0])


def test_step_impulse_values():
    v = run_get("[y, t] = step(tf([1], [1 1])); [yi, ti] = impulse(tf([1], [1 1]));",
                "y", "t", "yi", "ti")
    y, t = v["y"].host().reshape(-1), v["t"].host().reshape(-1)
    # first-order step: y = 1 - exp(-t)
    assert np.allclose(y, 1 - np.exp(-t), atol=1e-6)
    yi, ti = v["yi"].host().reshape(-1), v["ti"].host().reshape(-1)
    assert np.allclose(yi, np.exp(-ti), atol=1e-6)


def test_stepinfo():
    v = run_get("s = stepinfo(tf([1], [1 1]));", "s")
    rt = v["s"].get_scalar_field("RiseTime").host()[0, 0]
    assert abs(rt - np.log(9)) < 0.1    # ln(0.9/0.1) for 1st order
    assert v["s"].get_scalar_field("Overshoot").host()[0, 0] < 1e-6


def test_ss_roundtrip():
    v = run_get("sys = ss(-2, 1, 1, 0); p = pole(sys); g = dcgain(sys);",
                "p", "g")
    assert v["p"].host()[0, 0] == -2.0
    assert abs(v["g"].host()[0, 0] - 0.5) < 1e-12


def test_lqr():
    v = run_get("[K, S, e] = lqr(0, 1, 1, 1);", "K", "S", "e")
    # scalar CARE: -S^2 + 1 = 0 -> S = 1, K = 1, closed-loop eig = -1
    assert abs(v["K"].host()[0, 0] - 1.0) < 1e-9
    assert abs(v["S"].host()[0, 0] - 1.0) < 1e-9
    assert abs(v["e"].host()[0, 0] + 1.0) < 1e-9


def test_db():
    v = run_get("d = db(10); p = db(10, 'power');", "d", "p")
    assert abs(v["d"].host()[0, 0] - 20.0) < 1e-12
    assert abs(v["p"].host()[0, 0] - 10.0) < 1e-12


def test_pzmap_rlocus_nyquist_data():
    v = run_get("[p, z] = pzmap(tf([1 1], [1 3 2]));"
                "[r, k] = rlocus(tf([1], [1 1]));"
                "[re, im, w] = nyquist(tf([1], [1 1]));", "p", "z", "r", "k",
                "re", "im", "w")
    assert v["p"].size == 2 and v["z"].size == 1
    assert v["r"].shape[1] == v["k"].size
    H = v["re"].host().reshape(-1) + 1j * v["im"].host().reshape(-1)
    w = v["w"].host().reshape(-1)
    assert np.allclose(H, 1 / (1j * w + 1), atol=1e-12)
