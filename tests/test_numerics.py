"""ODE / optimization / quadrature / interpolation / signal conformance.

≙ reference builtin tests for math/ode, math/optim, math/interpolation,
math/signal (runmat-runtime/src/builtins/math/{ode,optim,interpolation}/)."""

import numpy as np

from helpers import run, scalar, val


def test_ode45_exponential_decay():
    assert scalar("[t, y] = ode45(@(t,y) -2*y, [0 1], 1); x = abs(y(end) - exp(-2));") < 1e-5


def test_ode45_dense_output():
    s = run("[t, y] = ode45(@(t,y) -y, 0:0.25:1, 1);")
    t = s.get("t").host().reshape(-1)
    y = s.get("y").host().reshape(-1)
    assert t.size == 5
    np.testing.assert_allclose(y, np.exp(-t), rtol=1e-3)


def test_ode45_system():
    assert scalar("[t, y] = ode45(@(t,y) [y(2); -y(1)], [0 2*pi], [1; 0]); "
                  "x = abs(y(end,1) - 1);") < 1e-3


def test_ode45_sol_struct():
    assert scalar("sol = ode45(@(t,y) -y, [0 1], 1); x = sol.x(end);") == 1.0


def test_ode23():
    assert scalar("[t, y] = ode23(@(t,y) -y, [0 1], 1); x = abs(y(end) - exp(-1));") < 1e-3


def test_ode15s_stiff():
    assert scalar("[t, y] = ode15s(@(t,y) -1000*(y - cos(t)), [0 1], 0); "
                  "x = abs(y(end) - cos(1));") < 5e-3


def test_odeset_tolerances():
    assert scalar("o = odeset('RelTol', 1e-8); [t, y] = ode45(@(t,y) -y, [0 1], 1, o); "
                  "x = abs(y(end) - exp(-1));") < 1e-7


def test_fzero_bracket_and_scalar():
    assert scalar("x = abs(fzero(@(x) x^3 - 2, 1) - 2^(1/3));") < 1e-10
    assert scalar("x = abs(fzero(@cos, [1 2]) - pi/2);") < 1e-10


def test_fminbnd():
    assert scalar("x = abs(fminbnd(@(x) (x-2)^2, 0, 5) - 2);") < 1e-6


def test_fminsearch_2d():
    assert scalar("v = fminsearch(@(p) (p(1)-1)^2 + (p(2)+2)^2, [0 0]); "
                  "x = norm(v - [1 -2]);") < 1e-6


def test_integral_quad():
    assert scalar("x = abs(integral(@(x) sin(x), 0, pi) - 2);") < 1e-10
    assert scalar("x = abs(quad(@(x) x.^2, 0, 1) - 1/3);") < 1e-5


def test_cumtrapz():
    h = val("x = cumtrapz([0 1 2 3], [0 1 2 3]);")
    np.testing.assert_allclose(h.reshape(-1), [0, 0.5, 2.0, 4.5])


def test_spline_accuracy():
    assert scalar("x = abs(spline(0:0.5:3, sin(0:0.5:3), 1.1) - sin(1.1));") < 1e-3


def test_pchip_monotone():
    s = run("y = pchip([1 2 3 4], [0 0 1 1], 1:0.1:4);")
    h = s.get("y").host().reshape(-1)
    assert h.min() >= -1e-12 and h.max() <= 1 + 1e-12


def test_ppval_matches_direct():
    assert scalar("pp = spline(0:5, cos(0:5)); "
                  "x = abs(ppval(pp, 2.5) - spline(0:5, cos(0:5), 2.5));") < 1e-12


def test_interp3_trilinear():
    assert scalar("[X,Y,Z] = meshgrid(1:3, 1:3, 1:3); V = X + 10*Y + 100*Z; "
                  "x = abs(interp3(X,Y,Z,V, 1.5, 2, 2.5) - 271.5);") < 1e-12


def test_polyder_polyint_roundtrip():
    h = val("x = polyder(polyint([3 2 1]));")
    np.testing.assert_allclose(h.reshape(-1), [3, 2, 1])


def test_polyvalm():
    h = val("x = polyvalm([1 0 -1], [2 0; 0 3]);")
    np.testing.assert_allclose(h, [[3, 0], [0, 8]])


def test_windows():
    assert abs(scalar("x = sum(hamming(8));") - 3.86) < 1e-10
    assert scalar("w = hann(5); x = w(3);") == 1.0


def test_hilbert_analytic():
    assert scalar("h = hilbert(cos(2*pi*(0:99)/10)); x = mean(abs(abs(h) - 1));") < 1e-12


def test_spectrogram_shape():
    h = val("[S, F, T] = spectrogram(sin(2*pi*(0:999)*0.1), 128, 64, 256); x = size(S);")
    np.testing.assert_allclose(h.reshape(-1), [129, 14])


def test_freqz_dc_gain():
    assert scalar("[H, W] = freqz([1 1], 1, 64); x = abs(H(1));") == 2.0


def test_detrend_removes_trend():
    assert scalar("x = abs(mean(detrend(1:100)));") < 1e-10


def test_magic_squares():
    for n in (3, 4, 5, 6, 8):
        s = run(f"M = magic({n}); r = sum(M); c = sum(M, 2); "
                f"t = M(1,1) + M(end,end);")
        M = s.get("M").host()
        target = n * (n * n + 1) / 2
        assert np.all(M.sum(0) == target) and np.all(M.sum(1) == target)
        assert sorted(M.reshape(-1).tolist()) == list(range(1, n * n + 1))


def test_special_matrices():
    assert scalar("T = toeplitz([1 2 3]); x = T(3,1)*10 + T(1,3);") == 33.0
    assert scalar("x = trace(pascal(4));") == 29.0
    assert scalar("B = blkdiag([1 2; 3 4], 5); x = B(3,3) + B(2,1);") == 8.0


def test_matrix_predicates():
    assert scalar("x = double(issymmetric([1 2; 2 1]));") == 1.0
    assert scalar("[lo, hi] = bandwidth([1 1 0; 1 1 1; 0 1 1]); x = lo*10+hi;") == 11.0


def test_distributions_moments():
    assert scalar("rng(1); x = double(abs(mean(normrnd(5, 2, 1, 20000)) - 5) < 0.1);") == 1.0
    assert scalar("rng(2); x = double(abs(mean(exprnd(3, 1, 20000)) - 3) < 0.15);") == 1.0


def test_geometry():
    assert scalar("x = polyarea([0 1 1 0], [0 0 1 1]);") == 1.0
    assert scalar("x = double(inpolygon(0.5, 0.5, [0 1 1 0], [0 0 1 1]));") == 1.0
    h = val("x = convhull([0 1 1 0 0.5], [0 0 1 1 0.5]);")
    assert h.size == 5 and h[0] == h[-1]


def test_morphology_and_labels():
    assert scalar("e = imdilate([0 0 0; 0 1 0; 0 0 0], ones(3)); x = sum(e(:));") == 9.0
    assert scalar("[L, n] = bwlabel([1 1 0; 0 0 0; 0 1 1]); x = n;") == 2.0


def test_coordinate_transforms_roundtrip():
    assert scalar("[th, r] = cart2pol(3, 4); [x2, y2] = pol2cart(th, r); "
                  "x = double(abs(x2 - 3) + abs(y2 - 4) < 1e-12);") == 1.0


def test_empty_reduction_identities():
    # MATLAB identity values for reductions of []
    from helpers import run_get
    v = run_get("a = sum([]); b = prod([]); c = any([]); d = all([]);"
                "e = mean([]); f = max([]);", "a", "b", "c", "d", "e", "f")
    assert v["a"].host()[0, 0] == 0.0
    assert v["b"].host()[0, 0] == 1.0
    assert not v["c"].host()[0, 0]
    assert v["d"].host()[0, 0]
    import numpy as np
    assert np.isnan(v["e"].host()[0, 0])
    assert v["f"].size == 0


def test_cat_trailing_dim():
    from helpers import run_get
    v = run_get("c = cat(3, [1 2], [3 4]); s = size(c, 3); p = c(1, 2, 2);",
                "s", "p")
    assert v["s"].host()[0, 0] == 2.0
    assert v["p"].host().reshape(-1)[0] == 4.0


def test_quadgk_infinite_limits():
    import numpy as np
    from helpers import run_get
    v = run_get("a = quadgk(@(x) exp(-x.^2), -inf, inf);"
                "b = quadgk(@(x) exp(-x), 0, inf);"
                "c = quadgk(@(x) exp(x), -inf, 0);", "a", "b", "c")
    assert abs(v["a"].host()[0, 0] - np.sqrt(np.pi)) < 1e-6
    assert abs(v["b"].host()[0, 0] - 1.0) < 1e-6
    assert abs(v["c"].host()[0, 0] - 1.0) < 1e-6
