"""Device dense-linalg parity at LAPACK tolerances (VERDICT round-1 task 1).

Every factorization/solve runs twice: host path (plain arrays) and device path
(gpuArray inputs through accel/dense.py), asserting both residual correctness
and host/device agreement. Mirrors the reference's per-builtin GPU parity
suites (e.g. runmat-runtime/src/builtins/math/trigonometry/sin.rs:508+ testing
CPU vs provider) applied to the solve/decomposition family
(runmat-accelerate-api/src/lib.rs:2422-2530).
"""

import numpy as np
import pytest

from helpers import run, run_get

TOL = 1e-10


def dev_host_pair(body: str, names):
    """Run `body` once with X as host, once as gpuArray; return value dicts."""
    setup_host = "A = magic(6) + 36*eye(6); B = reshape(1:12, 6, 2);"
    setup_dev = ("A = gpuArray(magic(6) + 36*eye(6)); "
                 "B = gpuArray(reshape(1:12, 6, 2));")
    h = run_get(setup_host + body, *names)
    d = run_get(setup_dev + body, *names, accelerate=True)
    return h, d


def assert_pair(body, names, tol=TOL):
    h, d = dev_host_pair(body, names)
    for n in names:
        hv, dv = h[n].host(), d[n].host()
        assert hv.shape == dv.shape, f"{n}: {hv.shape} vs {dv.shape}"
        np.testing.assert_allclose(dv, hv, rtol=tol, atol=tol, err_msg=n)


# --------------------------------------------------------------------------- #
# solve family
# --------------------------------------------------------------------------- #

def test_mldivide_square_device_resident():
    s = run("A = gpuArray(magic(6) + 36*eye(6)); b = gpuArray((1:6)'); "
            "x = A\\b; r = norm(A*x - b);", accelerate=True)
    assert s.get("x").on_device
    assert float(s.get("r").host().ravel()[0]) < TOL


def test_mldivide_matches_host():
    assert_pair("x = A \\ B; r = norm(A*x - B, 'fro');", ["x", "r"])


def test_mldivide_overdetermined_least_squares():
    s = run("A = gpuArray([1 0; 1 1; 1 2; 1 3]); b = gpuArray([1;2;4;4.5]); "
            "x = A\\b;", accelerate=True)
    x = s.get("x")
    assert x.on_device
    An = np.array([[1, 0], [1, 1], [1, 2], [1, 3]], float)
    bn = np.array([1, 2, 4, 4.5]).reshape(-1, 1)
    expect = np.linalg.lstsq(An, bn, rcond=None)[0]
    np.testing.assert_allclose(x.host(), expect, rtol=1e-9, atol=1e-9)


def test_mldivide_underdetermined():
    s = run("A = gpuArray([1 2 3; 4 5 7]); b = gpuArray([6; 16]); x = A\\b; "
            "r = norm(A*x - b);", accelerate=True)
    assert float(s.get("r").host().ravel()[0]) < 1e-9


def test_mrdivide_device():
    assert_pair("x = B' / A; r = norm(x*A - B', 'fro');", ["x", "r"])


def test_linsolve_device_triangular():
    s = run("U = gpuArray(triu(magic(5)) + 5*eye(5)); b = gpuArray((1:5)'); "
            "o.UT = true; x = linsolve(U, b, o); r = norm(U*x - b);",
            accelerate=True)
    assert s.get("x").on_device
    assert float(s.get("r").host().ravel()[0]) < TOL


def test_linsolve_trusts_flagged_triangle_device():
    # full matrix flagged UT: only the upper triangle may be read
    s = run("A = gpuArray(magic(4) + 8*eye(4)); b = gpuArray((1:4)'); "
            "o.UT = true; x = linsolve(A, b, o); "
            "r = norm(triu(A)*x - b);", accelerate=True)
    assert float(s.get("r").host().ravel()[0]) < TOL


# --------------------------------------------------------------------------- #
# factorizations
# --------------------------------------------------------------------------- #

def test_inv_det_device():
    assert_pair("Ai = inv(A); d = det(A); e = norm(Ai*A - eye(6));",
                ["Ai", "d", "e"], tol=1e-8)


def test_lu_device_all_forms():
    s = run("A = gpuArray(magic(6)); [L,U] = lu(A); e2 = norm(L*U - A,'fro'); "
            "[L3,U3,P] = lu(A); e3 = norm(P*A - L3*U3, 'fro'); "
            "Y = lu(A); yd = existsOnGPU(Y);", accelerate=True)
    assert float(s.get("e2").host().ravel()[0]) < 1e-9
    assert float(s.get("e3").host().ravel()[0]) < 1e-9
    assert bool(s.get("yd").host())


def test_lu_one_output_matches_host():
    assert_pair("Y = lu(A);", ["Y"])


def test_chol_device():
    s = run("S = gpuArray([4 1 0; 1 3 1; 0 1 2]); R = chol(S); "
            "e = norm(R'*R - S, 'fro'); L = chol(S, 'lower'); "
            "el = norm(L*L' - S, 'fro');", accelerate=True)
    assert float(s.get("e").host().ravel()[0]) < TOL
    assert float(s.get("el").host().ravel()[0]) < TOL


def test_chol_not_posdef_device():
    # MATLAB: p = failing 1-based pivot (leading 1x1 [1] is PD -> p == 2),
    # R = the successful (p-1)x(p-1) leading factor
    s = run("[R, p] = chol(gpuArray([1 2; 2 1]));", accelerate=True)
    assert float(s.get("p").host().ravel()[0]) == 2.0
    assert s.get("R").shape == (1, 1)
    assert abs(float(s.get("R").host().ravel()[0]) - 1.0) < 1e-12
    # one-output form raises
    s2 = run("ok = false; try, chol(gpuArray([1 2; 2 1])); catch e, "
             "ok = strcmp(e.identifier, 'MATLAB:posdef'); end",
             accelerate=True)
    assert bool(s2.get("ok").host())


def test_chol_semidefinite_flagged_device():
    """ADVICE r2: PSD-singular inputs (zero pivot, no NaN in the factor)
    must still report not-positive-definite like MATLAB/the reference."""
    s = run("[R, p] = chol(gpuArray([1 0; 0 0]));", accelerate=True)
    assert float(s.get("p").host().ravel()[0]) == 2.0
    assert s.get("R").shape == (1, 1)
    s2 = run("ok = false; try, chol(gpuArray(diag([2 1 0]))); catch e, "
             "ok = strcmp(e.identifier, 'MATLAB:posdef'); end",
             accelerate=True)
    assert bool(s2.get("ok").host())


def test_qr_device():
    s = run("A = gpuArray(magic(6)); [Q, R] = qr(A); "
            "e = norm(Q*R - A, 'fro'); o = norm(Q'*Q - eye(6), 'fro'); "
            "[Qe, Re] = qr(gpuArray(reshape(1:12, 4, 3)), 0); "
            "sz = size(Qe);", accelerate=True)
    assert float(s.get("e").host().ravel()[0]) < 1e-9
    assert float(s.get("o").host().ravel()[0]) < TOL
    assert tuple(s.get("sz").host().ravel()) == (4.0, 3.0)


def test_svd_device():
    s = run("A = gpuArray(reshape(1:12, 4, 3) + 12*eye(4,3)); "
            "[U,S,V] = svd(A); e = norm(U*S*V' - A, 'fro'); "
            "s1 = svd(A); "
            "[Ue,Se,Ve] = svd(A, 'econ'); ee = norm(Ue*Se*Ve' - A, 'fro');",
            accelerate=True)
    assert float(s.get("e").host().ravel()[0]) < 1e-9
    assert float(s.get("ee").host().ravel()[0]) < 1e-9
    assert s.get("s1").shape == (3, 1)


def test_svd_vals_match_host():
    assert_pair("s = svd(A);", ["s"], tol=1e-8)


def test_eig_symmetric_device():
    s = run("S = gpuArray([2 1 0; 1 2 1; 0 1 2]); w = eig(S); "
            "[V, D] = eig(S); e = norm(S*V - V*D, 'fro');", accelerate=True)
    assert float(s.get("e").host().ravel()[0]) < TOL
    w = np.sort(s.get("w").host().ravel())
    expect = np.sort(np.linalg.eigvalsh(
        np.array([[2, 1, 0], [1, 2, 1], [0, 1, 2]], float)))
    np.testing.assert_allclose(w, expect, rtol=TOL, atol=TOL)


def test_eig_nonsymmetric_falls_back_to_host():
    # nonsymmetric stays correct via the host path even with device input
    s = run("A = gpuArray([0 1; -2 -3]); w = sort(real(eig(A)));",
            accelerate=True)
    np.testing.assert_allclose(s.get("w").host().ravel(), [-2.0, -1.0],
                               atol=1e-9)


def test_norm_rank_trace_pinv_device():
    assert_pair("nf = norm(A, 'fro'); n1 = norm(A, 1); ni = norm(A, inf); "
                "rk = rank(A); tr = trace(A); P = pinv(A); "
                "ep = norm(P*A - eye(6), 'fro');",
                ["nf", "n1", "ni", "rk", "tr", "ep"], tol=1e-8)


def test_vector_norms_device():
    s = run("v = gpuArray([3 4]); n2 = norm(v); n1 = norm(v, 1); "
            "ni = norm(v, inf);", accelerate=True)
    assert float(s.get("n2").host().ravel()[0]) == pytest.approx(5.0)
    assert float(s.get("n1").host().ravel()[0]) == pytest.approx(7.0)
    assert float(s.get("ni").host().ravel()[0]) == pytest.approx(4.0)


def test_single_class_device_linalg():
    s = run("A = gpuArray(single(magic(4) + 8*eye(4))); x = A\\single((1:4)'); "
            "c = class(x); r = norm(A*x - (1:4)');", accelerate=True)
    assert s.get("c").to_str() == "single"
    assert float(s.get("r").host().ravel()[0]) < 1e-4


# --------------------------------------------------------------------------- #
# fft on device
# --------------------------------------------------------------------------- #

def test_fft_device_parity():
    src = ("t = linspace(0, 1, 128); x0 = sin(2*pi*5*t) + 0.5*cos(2*pi*11*t); "
           "{}; y = fft(x); m = abs(y);")
    h = run_get(src.format("x = x0"), "y", "m")
    d = run_get(src.format("x = gpuArray(x0)"), "y", "m", accelerate=True)
    np.testing.assert_allclose(d["y"].host(), h["y"].host(),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(d["m"].host(), h["m"].host(),
                               rtol=1e-9, atol=1e-9)


def test_fft_device_with_length_and_dim():
    src = "X0 = reshape(1:24, 4, 6); {}; Y = fft(X, 8, 2);"
    h = run_get(src.format("X = X0"), "Y")
    d = run_get(src.format("X = gpuArray(X0)"), "Y", accelerate=True)
    np.testing.assert_allclose(d["Y"].host(), h["Y"].host(),
                               rtol=1e-9, atol=1e-9)


def test_ifft_fft2_device_roundtrip():
    s = run("A = gpuArray(magic(8)); F = fft2(A); B = real(ifft2(F)); "
            "e = norm(B - magic(8), 'fro'); "
            "v = gpuArray(1:16); w = real(ifft(fft(v))); "
            "ev = norm(w - (1:16));", accelerate=True)
    assert float(s.get("e").host().ravel()[0]) < 1e-9
    assert float(s.get("ev").host().ravel()[0]) < 1e-9


def test_fft_stays_resident():
    s = run("x = gpuArray(1:64); y = fft(x); z = abs(y) + 1;",
            accelerate=True)
    assert s.get("z").on_device


# --------------------------------------------------------------------------- #
# fallback memo: unsupported kinds gracefully host-fall
# --------------------------------------------------------------------------- #

def test_failure_memo_falls_back(monkeypatch):
    from runmat_tpu.accel import active_engine
    s = run("x = 1;", accelerate=True)
    eng = active_engine()
    eng.dense._bad.add(("solve", "float64"))
    r = s.execute("A = gpuArray(magic(4) + 8*eye(4)); b = gpuArray((1:4)'); "
                  "x = A\\b; r = norm(A*x - b);")
    assert r.error is None
    assert float(s.get("r").host().ravel()[0]) < TOL
    eng.dense._bad.discard(("solve", "float64"))


def test_eig_nonsymmetric_device_real_spectrum():
    """VERDICT r3 #4: general eig runs on device; a real spectrum stays
    device-resident (no matrix round-trip in an eigen-loop)."""
    s = run("A = gpuArray([4 1 0; 1 3 1; 2 1 5]); w = eig(A); "
            "d = existsOnGPU(w); ws = sort(gather(w));", accelerate=True)
    assert bool(s.get("d").host().ravel()[0])
    ref = np.sort(np.linalg.eigvals(
        np.array([[4, 1, 0], [1, 3, 1], [2, 1, 5]], float)).real)
    np.testing.assert_allclose(s.get("ws").host().ravel(), ref, atol=1e-9)


def test_eig_nonsymmetric_device_complex_spectrum():
    # rotation-like block: conjugate pair — MATLAB returns complex
    s = run("A = gpuArray([0 1; -2 -3]); B = gpuArray([1 -2; 4 1]); "
            "wr = sort(real(eig(A))); wc = eig(B);", accelerate=True)
    np.testing.assert_allclose(s.get("wr").host().ravel(), [-2.0, -1.0],
                               atol=1e-9)
    wc = np.sort_complex(s.get("wc").host().ravel() + 0.0)
    ref = np.sort_complex(np.linalg.eigvals(
        np.array([[1, -2], [4, 1]], float)) + 0.0)
    np.testing.assert_allclose(wc, ref, atol=1e-9)


def test_eig_device_matches_lapack_random_and_defective():
    from runmat_tpu.values import MatArray
    from runmat_tpu.session import Session
    rng = np.random.default_rng(4)
    fixtures = [rng.standard_normal((24, 24)),
                np.eye(12) * 2 + np.diag(np.ones(11), 1),   # defective
                np.diag(np.ones(15), -1)]                    # nilpotent-ish
    s = Session(accelerate=True)
    for i, A in enumerate(fixtures):
        s.set("A", MatArray(A, "double"))
        r = s.execute("w = eig(gpuArray(A));")
        assert r.error is None, r.error
        w = np.asarray(s.get("w").host()).ravel()
        if s.get("w").is_complex:
            w = w.astype(complex)
        ref = np.linalg.eigvals(A)
        # greedy nearest matching (order is LAPACK- vs block-specific)
        got = list(w.astype(complex))
        err = 0.0
        for rv in ref:
            d = [abs(g - rv) for g in got]
            j = int(np.argmin(d))
            err = max(err, d[j])
            got.pop(j)
        scale = max(1.0, float(np.max(np.abs(ref))))
        assert err / scale < 1e-6, (i, err)


def test_eig_full_vd_device_nonsymmetric():
    """[V, D] = eig(A) as one device program (VERDICT r4 #3): Schur-vector
    accumulation + quasi-triangular back-substitution (accel/eig_qr.py
    eig_full). Residual ||AV - VD||/||A|| must beat 1e-10 in f64."""
    from runmat_tpu.session import Session
    from runmat_tpu.values import MatArray
    s = Session(accelerate=True)
    rng = np.random.default_rng(11)
    for n in (2, 5, 24, 64):
        A = rng.standard_normal((n, n))
        s.set("A", MatArray(A, "double"))
        r = s.execute("[V, D] = eig(gpuArray(A)); "
                      "res = gather(norm(gpuArray(A)*V - V*D) / norm(A));")
        assert r.error is None, r.error
        assert float(s.get("res").host().reshape(-1)[0]) < 1e-10, n


def test_eig_full_vd_device_symmetric_and_repeated():
    from runmat_tpu.session import Session
    from runmat_tpu.values import MatArray
    s = Session(accelerate=True)
    rng = np.random.default_rng(12)
    B = rng.standard_normal((32, 32))
    fixtures = [B + B.T,
                np.kron(np.eye(4), np.array([[1.0, 2], [3, 4]])),
                np.array([[0.0, -1], [1, 0]])]       # pure complex pair
    for A in fixtures:
        s.set("A", MatArray(A, "double"))
        r = s.execute("[V, D] = eig(gpuArray(A)); "
                      "res = gather(norm(gpuArray(A)*V - V*D) / norm(A));")
        assert r.error is None, r.error
        assert float(s.get("res").host().reshape(-1)[0]) < 1e-10


def test_eig_full_complex_spectrum_planes_mode():
    """The [V,D] device path keeps complex results resident as split
    planes when the platform has no native complex dtype."""
    import os
    os.environ["RUNMAT_TPU_COMPLEX_NATIVE"] = "0"
    from runmat_tpu.accel import active_engine
    eng = active_engine()
    if eng is not None:
        eng._supports_complex = None
    try:
        from runmat_tpu.session import Session
        from runmat_tpu.values import MatArray
        s = Session(accelerate=True)
        A = np.array([[0.0, -2], [1, 0]])
        s.set("A", MatArray(A, "double"))
        r = s.execute("[V, D] = eig(gpuArray(A)); "
                      "res = gather(norm(gpuArray(A)*V - V*D)); "
                      "dd = gather(D);")
        assert r.error is None, r.error
        assert float(s.get("res").host().reshape(-1)[0]) < 1e-10
        dd = np.asarray(s.get("dd").host())
        assert np.iscomplexobj(dd) and abs(abs(dd[0, 0].imag)
                                           - np.sqrt(2)) < 1e-10
    finally:
        os.environ.pop("RUNMAT_TPU_COMPLEX_NATIVE", None)
        if eng is not None:
            eng._supports_complex = None
