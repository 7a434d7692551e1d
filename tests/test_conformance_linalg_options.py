"""Tier D4: dense-linalg option surfaces (≙ provider solve/decomposition
family, runmat-accelerate-api/src/lib.rs:2422-2530 — economy QR, pivoting,
chol info, linsolve structure options, generalized eig, svd forms)."""

import numpy as np

from runmat_tpu.session import Session

ASSERT = {"count": 0}


def bump(n=1):
    ASSERT["count"] += n


_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=False)
    return _SESS


def run_src(src):
    r = sess().execute(src)
    assert r.error is None, (src, r.error)
    return sess()


def get(name):
    return np.asarray(sess().get(name).host())


def test_qr_forms():
    A = np.arange(1, 13, dtype=float).reshape(4, 3, order="F") + np.eye(4, 3)
    run_src("A = reshape(1:12, 4, 3) + eye(4, 3);")
    # full
    run_src("[Q, R] = qr(A);")
    Q, R = get("Q"), get("R")
    assert Q.shape == (4, 4) and R.shape == (4, 3)
    np.testing.assert_allclose(Q @ R, A, atol=1e-9)
    np.testing.assert_allclose(Q.T @ Q, np.eye(4), atol=1e-9)
    bump(2)
    # economy
    run_src("[Qe, Re] = qr(A, 0);")
    Qe, Re = get("Qe"), get("Re")
    assert Qe.shape == (4, 3) and Re.shape == (3, 3)
    np.testing.assert_allclose(Qe @ Re, A, atol=1e-9)
    bump(2)
    # 'econ' spelling
    run_src("[Qc, Rc] = qr(A, 'econ');")
    assert get("Qc").shape == (4, 3)
    bump()


def test_lu_forms():
    run_src("B = [4 3; 6 3];")
    B = np.array([[4.0, 3], [6, 3]])
    run_src("[L, U, P] = lu(B);")
    L, U, P = get("L"), get("U"), get("P")
    np.testing.assert_allclose(L @ U, P @ B, atol=1e-12)
    assert np.allclose(np.tril(L), L) and np.allclose(np.triu(U), U)
    bump(2)
    run_src("[L2, U2] = lu(B);")
    np.testing.assert_allclose(get("L2") @ get("U2"), B, atol=1e-12)
    bump()


def test_chol_info_output():
    run_src("[R, p] = chol([4 2; 2 3]);")
    assert float(get("p").reshape(-1)[0]) == 0.0
    R = get("R")
    np.testing.assert_allclose(R.T @ R, [[4, 2], [2, 3]], atol=1e-12)
    bump(2)
    run_src("[R1, p1] = chol([1 2; 2 1]);")
    assert float(get("p1").reshape(-1)[0]) > 0
    bump()


def test_svd_forms():
    run_src("M = reshape(1:8, 4, 2);")
    M = np.arange(1, 9, dtype=float).reshape(4, 2, order="F")
    s = run_src("sv = svd(M);")
    np.testing.assert_allclose(get("sv").reshape(-1),
                               np.linalg.svd(M, compute_uv=False),
                               atol=1e-9)
    bump()
    run_src("[U, S, V] = svd(M);")
    U, S, V = get("U"), get("S"), get("V")
    assert U.shape == (4, 4) and S.shape == (4, 2) and V.shape == (2, 2)
    np.testing.assert_allclose(U @ S @ V.T, M, atol=1e-9)
    bump(2)
    run_src("[Ue, Se, Ve] = svd(M, 'econ');")
    assert get("Ue").shape == (4, 2) and get("Se").shape == (2, 2)
    np.testing.assert_allclose(get("Ue") @ get("Se") @ get("Ve").T, M,
                               atol=1e-9)
    bump(2)


def test_eig_forms():
    run_src("E = [2 0; 0 3];")
    np.testing.assert_allclose(np.sort(get_expr("eig(E)").reshape(-1)),
                               [2, 3], atol=1e-12)
    bump()
    run_src("[V, D] = eig([2 1; 1 2]);")
    V, D = get("V"), get("D")
    A = np.array([[2.0, 1], [1, 2]])
    np.testing.assert_allclose(A @ V, V @ D, atol=1e-9)
    bump()
    # generalized eig: A x = lambda B x
    run_src("ge = eig([2 0; 0 4], [1 0; 0 2]);")
    np.testing.assert_allclose(np.sort(get("ge").reshape(-1)), [2, 2],
                               atol=1e-9)
    bump()


def get_expr(expr):
    run_src(f"__lx = {expr};")
    return get("__lx")


def test_linsolve_option_struct():
    run_src("A = [2 1; 0 3]; b = [5; 6];")
    x = get_expr("linsolve(A, b)")
    np.testing.assert_allclose(np.array([[2.0, 1], [0, 3]]) @ x,
                               [[5], [6]], atol=1e-12)
    bump()
    # UT option uses the triangular fast path but must agree
    run_src("opts.UT = true; xu = linsolve(A, b, opts);")
    np.testing.assert_allclose(get("xu"), x, atol=1e-12)
    bump()
    run_src("L = [3 0; 1 2]; bl = [6; 8]; optsL.LT = true; "
            "xl = linsolve(L, bl, optsL);")
    np.testing.assert_allclose(np.array([[3.0, 0], [1, 2]]) @ get("xl"),
                               [[6], [8]], atol=1e-12)
    bump()


def test_solve_operator_shapes():
    # mldivide square / overdetermined / underdetermined
    run_src("xs = [2 0; 0 4] \\ [2; 8];")
    np.testing.assert_allclose(get("xs").reshape(-1), [1, 2], atol=1e-12)
    bump()
    run_src("Ao = [1 0; 0 1; 1 1]; bo = [1; 2; 3.1]; xo = Ao \\ bo;")
    ref = np.linalg.lstsq(np.array([[1.0, 0], [0, 1], [1, 1]]),
                          np.array([1, 2, 3.1]), rcond=None)[0]
    np.testing.assert_allclose(get("xo").reshape(-1), ref, atol=1e-9)
    bump()
    run_src("xr = [4; 6] / 2;")
    np.testing.assert_allclose(get("xr").reshape(-1), [2, 3], atol=1e-12)
    bump()
    # norm consistency for mrdivide: x*A = b
    run_src("xA = [5 6] / [1 2; 3 4];")
    np.testing.assert_allclose(get("xA") @ np.array([[1.0, 2], [3, 4]]),
                               [[5, 6]], atol=1e-9)
    bump()


def test_matrix_function_grid():
    A = np.array([[1.0, 1], [0, 1]])
    run_src("F = expm([1 1; 0 1]);")
    import scipy.linalg as sla
    np.testing.assert_allclose(get("F"), sla.expm(A), atol=1e-9)
    bump()
    run_src("G = logm(expm([0.3 0; 0 0.2]));")
    np.testing.assert_allclose(get("G"), np.diag([0.3, 0.2]), atol=1e-8)
    bump()
    run_src("S = sqrtm([4 0; 0 9]);")
    np.testing.assert_allclose(get("S"), np.diag([2.0, 3.0]), atol=1e-9)
    bump()
    for p, want in [(2, np.linalg.matrix_power(A, 2)),
                    (0, np.eye(2)), (-1, np.linalg.inv(A))]:
        run_src(f"P = [1 1; 0 1] ^ {p};")
        np.testing.assert_allclose(get("P"), want, atol=1e-9)
        bump()


def test_cond_rank_rcond_grid():
    run_src("C = [1 0; 0 1e-8];")
    assert abs(float(get_expr("cond(C)").reshape(-1)[0]) - 1e8) < 1
    bump()
    assert float(get_expr("rank([1 2; 2 4])").reshape(-1)[0]) == 1.0
    assert float(get_expr("rank(eye(3))").reshape(-1)[0]) == 3.0
    bump(2)
    rc = float(get_expr("rcond(eye(2))").reshape(-1)[0])
    assert abs(rc - 1.0) < 1e-12
    bump()
    assert float(get_expr("det([2 0; 0 3])").reshape(-1)[0]) == 6.0
    tr = float(get_expr("trace(magic(4))").reshape(-1)[0])
    assert tr == 34.0
    bump(2)


def test_d4_total():
    print(f"\ntier-D4 assertions: {ASSERT['count']}")
    assert ASSERT["count"] >= 25
