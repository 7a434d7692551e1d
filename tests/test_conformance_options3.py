"""Tier D3: option-surface conformance for the domain toolboxes (control,
graph, finance, comms, image, ODE/optim) — closed-form or
independently-computed oracles per option combination."""

import math

import numpy as np

from runmat_tpu.session import Session
from runmat_tpu.values import MatArray, StringArray

ASSERT = {"count": 0}


def bump(n=1):
    ASSERT["count"] += n


_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=False)
    return _SESS


def run_src(src: str):
    r = sess().execute(src)
    assert r.error is None, (src, r.error)


def ev_num(expr: str) -> np.ndarray:
    s = sess()
    r = s.execute(f"__d3 = {expr};")
    assert r.error is None, (expr, r.error)
    return np.asarray(s.get("__d3").host())


def close(expr, want, tol=1e-9):
    got = ev_num(expr).astype(float).reshape(-1)
    want = np.asarray(want, float).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol, err_msg=expr)
    bump()


# ----------------------------------------------------------------- finance

def _bs_call(S, K, r, T, sig):
    from math import erf, exp, log, sqrt

    def N(x):
        return 0.5 * (1 + erf(x / sqrt(2)))

    d1 = (log(S / K) + (r + sig * sig / 2) * T) / (sig * sqrt(T))
    d2 = d1 - sig * sqrt(T)
    return S * N(d1) - K * exp(-r * T) * N(d2)


def test_blsprice_grid():
    grid = [(100, 100, 0.05, 1.0, 0.2), (110, 100, 0.01, 0.5, 0.3),
            (90, 100, 0.03, 2.0, 0.15), (100, 120, 0.0, 1.0, 0.25)]
    for (S, K, r, T, sig) in grid:
        call = _bs_call(S, K, r, T, sig)
        put = call - S + K * math.exp(-r * T)      # put-call parity
        c, p = None, None
        s = sess()
        rr = s.execute(f"[__c, __p] = blsprice({S}, {K}, {r}, {T}, {sig});")
        assert rr.error is None, rr.error
        c = float(np.asarray(s.get("__c").host()).reshape(-1)[0])
        p = float(np.asarray(s.get("__p").host()).reshape(-1)[0])
        assert abs(c - call) < 1e-8, (S, K)
        assert abs(p - put) < 1e-8, (S, K)
        bump(2)
    # implied vol round trip
    S, K, r, T, sig = 100, 100, 0.05, 1.0, 0.2
    call = _bs_call(S, K, r, T, sig)
    got = float(ev_num(f"blsimpv({S}, {K}, {r}, {T}, {call})").reshape(-1)[0])
    assert abs(got - sig) < 1e-6
    bump()


# ------------------------------------------------------------------- graph

def test_graph_option_grid():
    run_src("G = graph([1 1 2 3], [2 3 4 4], [1 4 2 1]);")
    close("numnodes(G)", [4])
    close("numedges(G)", [4])
    # weighted shortest path 1->4: 1-2-4 (1+2=3) beats 1-3-4 (4+1=5)
    s = sess()
    r = s.execute("[__p, __d] = shortestpath(G, 1, 4);")
    assert r.error is None, r.error
    np.testing.assert_allclose(
        np.asarray(s.get("__p").host()).reshape(-1), [1, 2, 4])
    assert float(np.asarray(s.get("__d").host()).reshape(-1)[0]) == 3.0
    bump(2)
    close("distances(G, 1, 3)", [4.0])
    # degree / neighbors
    close("degree(G, 1)", [2])
    np.testing.assert_allclose(ev_num("neighbors(G, 4)").reshape(-1), [2, 3])
    bump()
    # unweighted digraph reachability
    run_src("D = digraph([1 2 3], [2 3 1]);")
    close("numedges(D)", [3])
    np.testing.assert_allclose(
        np.sort(ev_num("bfsearch(D, 1)").reshape(-1)), [1, 2, 3])
    bump()


# ----------------------------------------------------------------- control

def test_control_option_grid():
    # first-order system 1/(s+1): step reaches 1-exp(-t)
    run_src("sys = tf(1, [1 1]); [__y, __t] = step(sys);")
    s = sess()
    y = np.asarray(s.get("__y").host()).reshape(-1)
    t = np.asarray(s.get("__t").host()).reshape(-1)
    np.testing.assert_allclose(y, 1 - np.exp(-t), atol=1e-6)
    bump()
    # dcgain options
    close("dcgain(tf(3, [1 3]))", [1.0])
    close("dcgain(tf([2 4], [1 2]))", [2.0])
    # pole/zero extraction
    p = np.sort(ev_num("pole(tf(1, [1 3 2]))").reshape(-1))
    np.testing.assert_allclose(p, [-2, -1], atol=1e-9)
    bump()
    z = ev_num("zero(tf([1 5], [1 1]))").reshape(-1)
    np.testing.assert_allclose(z, [-5], atol=1e-9)
    bump()
    # feedback: G/(1+G) for G = 1/s -> 1/(s+1): dcgain 1
    close("dcgain(feedback(tf(1, [1 0]), 1))", [1.0])
    # lqr on the double integrator returns a stabilizing gain
    run_src("[__K, __S, __e] = lqr([0 1; 0 0], [0; 1], eye(2), 1);")
    e = np.asarray(s.get("__e").host()).reshape(-1)
    assert (np.real(e) < 0).all()
    bump()


# ------------------------------------------------------------------- comms

def test_comms_modulation_grid():
    # BPSK: symbols at +-1, round trip exact
    run_src("bits = [0 1 1 0]'; sym = pskmod(bits, 2); "
            "back = pskdemod(sym, 2);")
    s = sess()
    np.testing.assert_allclose(
        np.asarray(s.get("back").host()).reshape(-1), [0, 1, 1, 0])
    bump()
    # QPSK round trip over the full alphabet
    run_src("msg = (0:3)'; q = pskmod(msg, 4); qb = pskdemod(q, 4);")
    np.testing.assert_allclose(
        np.asarray(s.get("qb").host()).reshape(-1), [0, 1, 2, 3])
    bump()
    # 16-QAM round trip
    run_src("m16 = (0:15)'; w = qammod(m16, 16); wb = qamdemod(w, 16);")
    np.testing.assert_allclose(
        np.asarray(s.get("wb").host()).reshape(-1), np.arange(16))
    bump()
    # unit-average-power option normalizes the constellation
    run_src("qn = qammod((0:15)', 16, 'UnitAveragePower', true);")
    pw = float(np.mean(np.abs(np.asarray(
        s.get("qn").host()).reshape(-1)) ** 2))
    assert abs(pw - 1.0) < 1e-9
    bump()


# -------------------------------------------------------------------- image

def test_image_option_grid():
    run_src("I = reshape(1:16, 4, 4) / 16;")
    # imresize scale + size forms
    assert ev_num("size(imresize(I, 2))").reshape(-1).tolist() == [8, 8]
    bump()
    assert ev_num("size(imresize(I, [2 8]))").reshape(-1).tolist() == [2, 8]
    bump()
    # rgb2gray on a pure channel: Rec.601 weights
    run_src("R = zeros(2, 2, 3); R(:, :, 1) = 1; __g = rgb2gray(R);")
    g = float(np.asarray(sess().get("__g").host()).reshape(-1)[0])
    assert abs(g - 0.2989) < 1e-3
    bump()
    # im2double / im2uint8 round trip
    close("max(max(im2double(uint8(255) * ones(2, 'uint8'))))", [1.0])
    close("double(max(max(im2uint8(ones(2)))))", [255.0])
    # padarray options
    assert ev_num("size(padarray(I, [1 2]))").reshape(-1).tolist() == [6, 8]
    bump()
    np.testing.assert_allclose(
        ev_num("padarray([1 2], [0 1], 7)").reshape(-1), [7, 1, 2, 7])
    bump()


# ---------------------------------------------------------------- ode/optim

def test_ode_solver_option_grid():
    # dy/dt = -y, y(0)=1: y(2) = exp(-2); both ode45 and ode23 within tol
    for solver in ("ode45", "ode23"):
        run_src(f"[__t, __y] = {solver}(@(t, y) -y, [0 2], 1);")
        s = sess()
        y = np.asarray(s.get("__y").host()).reshape(-1)
        assert abs(y[-1] - math.exp(-2)) < 1e-3, solver
        bump()
    # odeset tolerance option tightens the result
    run_src("opts = odeset('RelTol', 1e-8); "
            "[__t2, __y2] = ode45(@(t, y) -y, [0 2], 1, opts);")
    y2 = np.asarray(sess().get("__y2").host()).reshape(-1)
    assert abs(y2[-1] - math.exp(-2)) < 1e-6
    bump()
    # stiff solver handles lambda = -1000
    run_src("[__t3, __y3] = ode15s(@(t, y) -1000 * y, [0 0.1], 1);")
    y3 = np.asarray(sess().get("__y3").host()).reshape(-1)
    assert abs(y3[-1]) < 1e-3
    bump()


def test_optimizer_option_grid():
    close("fzero(@(x) x^2 - 4, 1)", [2.0], tol=1e-8)
    close("fzero(@(x) cos(x), 1)", [math.pi / 2], tol=1e-8)
    close("fminbnd(@(x) (x - 2)^2, 0, 5)", [2.0], tol=1e-5)
    run_src("[__x, __fv] = fminsearch(@(v) (v(1) - 1)^2 + (v(2) + 2)^2, "
            "[0 0]);")
    s = sess()
    x = np.asarray(s.get("__x").host()).reshape(-1)
    np.testing.assert_allclose(x, [1, -2], atol=1e-3)
    bump()
    # quadrature option surfaces
    close("integral(@(x) x.^2, 0, 1)", [1.0 / 3.0], tol=1e-9)
    close("integral(@(x) exp(-x.^2), -inf, inf)", [math.sqrt(math.pi)],
          tol=1e-7)
    close("quadgk(@(x) sin(x), 0, pi)", [2.0], tol=1e-9)


def test_option_battery3_total():
    print(f"\ntier-D3 assertions: {ASSERT['count']}")
    assert ASSERT["count"] >= 30


def test_minmax_all_linear_and_griddata():
    run_src("[__m, __i] = max([1 5; 9 2], [], 'all', 'linear');")
    s = sess()
    assert float(np.asarray(s.get("__m").host()).reshape(-1)[0]) == 9.0
    # F-order linear index of 9 in [1 5; 9 2] is 2
    assert float(np.asarray(s.get("__i").host()).reshape(-1)[0]) == 2.0
    bump(2)
    run_src("[__mn, __in] = min([3 0; -1 7], [], 'all', 'linear');")
    assert float(np.asarray(sess().get("__mn").host()).reshape(-1)[0]) == -1
    assert float(np.asarray(sess().get("__in").host()).reshape(-1)[0]) == 2.0
    bump(2)
    # griddata on a plane reproduces the plane at interior points
    close("griddata([0 1 0 1], [0 0 1 1], [0 1 1 2], 0.5, 0.5)", [1.0],
          tol=1e-9)
    close("griddata([0 1 0 1], [0 0 1 1], [0 1 1 2], 0.25, 0.75)", [1.0],
          tol=1e-9)
    # nearest method snaps to the closest sample
    close("griddata([0 1 0 1], [0 0 1 1], [0 1 1 2], 0.9, 0.9, 'nearest')",
          [2.0])
    # outside the hull -> NaN
    got = ev_num("griddata([0 1 0 1], [0 0 1 1], [0 1 1 2], 5, 5)")
    assert np.isnan(got.reshape(-1)[0])
    bump()
