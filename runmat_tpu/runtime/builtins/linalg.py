"""Dense linear algebra: inv/det/norm/rank/cond/lu/chol/qr/svd/eig/...

Reference parity: runmat-runtime/src/{blas.rs,lapack.rs} + provider solve/
decomposition hooks (runmat-accelerate-api/src/lib.rs:2422-2530). Host path
uses numpy/LAPACK; device path (accel engine) dispatches to jnp.linalg on the
MXU with the same MATLAB option surfaces (economy QR, chol info output, ...).
"""

from __future__ import annotations

import numpy as np

from ... import dtypes
from ...errors import MatError, bad_arg
from ...values import MatArray, is_text, text_of
from ..registry import builtin
from .common import scalar_int


def _sq(x: MatArray, fn: str) -> np.ndarray:
    h = x.host()
    if h.ndim != 2 or h.shape[0] != h.shape[1]:
        raise MatError(f"MATLAB:{fn}:inputMustBeSquare", "Matrix must be square.")
    return h.astype(np.complex128 if h.dtype.kind == "c" else np.float64)


def _f(x: MatArray) -> np.ndarray:
    h = x.host()
    return h.astype(np.complex128 if h.dtype.kind == "c" else np.float64)


def _out(r: np.ndarray, x: MatArray) -> MatArray:
    out_class = "single" if x.mclass == "single" else "double"
    if np.iscomplexobj(r) and np.all(r.imag == 0):
        r = r.real
    return MatArray(dtypes.cast_to_class(np.atleast_2d(r), out_class), out_class)


@builtin("inv", category="math/linalg", min_in=1, max_in=1)
def m_inv(x):
    a = _sq(x, "inv")
    try:
        r = np.linalg.inv(a)
    except np.linalg.LinAlgError:
        r = np.full_like(a, np.inf)
    return _out(r, x)


@builtin("pinv", category="math/linalg", min_in=1, max_in=2)
def m_pinv(x, tol=None):
    a = _f(x)
    r = np.linalg.pinv(a, rcond=tol.scalar_double() if tol is not None else 1e-15)
    return _out(r, x)


@builtin("det", category="math/linalg", min_in=1, max_in=1)
def m_det(x):
    return _out(np.linalg.det(_sq(x, "det")), x)


@builtin("trace", category="math/linalg", min_in=1, max_in=1)
def m_trace(x):
    return _out(np.trace(_f(x)), x)


@builtin("rank", category="math/linalg", min_in=1, max_in=2)
def m_rank(x, tol=None):
    a = _f(x)
    return MatArray.scalar(float(np.linalg.matrix_rank(
        a, tol=tol.scalar_double() if tol is not None else None)))


@builtin("norm", category="math/linalg", min_in=1, max_in=2)
def m_norm(x, p=None):
    h = _f(x)
    is_vec = h.ndim == 2 and (h.shape[0] == 1 or h.shape[1] == 1)
    if p is not None and is_text(p):
        t = text_of(p)
        if t == "fro":
            return MatArray.scalar(float(np.linalg.norm(h, "fro")))
        if t == "inf":
            p = MatArray.scalar(np.inf)
        else:
            raise bad_arg("norm", f"Unknown norm option '{t}'.")
    pv = p.scalar_double() if p is not None else 2.0
    if is_vec:
        v = h.reshape(-1)
        return MatArray.scalar(float(np.linalg.norm(v, pv)))
    if pv in (1.0, 2.0, np.inf):
        return MatArray.scalar(float(np.linalg.norm(h, pv)))
    raise bad_arg("norm", "Matrix norm only supports 1, 2, inf, 'fro'.")


@builtin("cond", category="math/linalg", min_in=1, max_in=2)
def m_cond(x, p=None):
    pv = 2 if p is None else (p.scalar_double() if isinstance(p, MatArray) else text_of(p))
    return MatArray.scalar(float(np.linalg.cond(_f(x), pv)))


@builtin("rcond", category="math/linalg", min_in=1, max_in=1)
def m_rcond(x):
    a = _sq(x, "rcond")
    try:
        c = np.linalg.cond(a, 1)
        return MatArray.scalar(0.0 if not np.isfinite(c) else 1.0 / c)
    except np.linalg.LinAlgError:
        return MatArray.scalar(0.0)


@builtin("lu", category="math/linalg", min_in=1, max_in=1, pass_nargout=True)
def m_lu(x, nargout=1):
    """[L,U] / [L,U,P] = lu(A) via LAPACK getrf (scipy-free partial pivoting)."""
    a = _sq(x, "lu") if x.shape[0] == x.shape[1] else _f(x)
    m, n = a.shape
    U = a.copy()
    k = min(m, n)
    L = np.zeros((m, k), dtype=U.dtype)
    perm = np.arange(m)
    for j in range(k):
        piv = j + int(np.argmax(np.abs(U[j:, j])))
        if piv != j:
            U[[j, piv], :] = U[[piv, j], :]
            perm[[j, piv]] = perm[[piv, j]]
            L[[j, piv], :j] = L[[piv, j], :j]
        if U[j, j] != 0:
            mults = U[j + 1:, j] / U[j, j]
        else:
            mults = np.zeros(m - j - 1, dtype=U.dtype)
        L[j + 1:, j] = mults
        L[j, j] = 1.0
        U[j + 1:, j:] = U[j + 1:, j:] - np.outer(mults, U[j, j:])
    Uo = np.triu(U[:k, :])
    P = np.eye(m)[perm]
    if nargout <= 1:
        # Y = L + U with the unit diagonal of L omitted (MATLAB one-output form)
        full_L = np.zeros((m, n), dtype=U.dtype)
        full_L[:, :k] = np.tril(L, -1)
        full_U = np.zeros((m, n), dtype=U.dtype)
        full_U[:k, :] = Uo
        return _out(full_L + full_U, x)
    if nargout == 2:
        return [_out(P.T @ L, x), _out(Uo, x)]
    return [_out(L, x), _out(Uo, x), _out(P, x)]


@builtin("chol", category="math/linalg", min_in=1, max_in=2, pass_nargout=True)
def m_chol(x, opt=None, nargout=1):
    a = _sq(x, "chol")
    lower = opt is not None and text_of(opt) == "lower"
    try:
        L = np.linalg.cholesky(a)
        R = L if lower else L.conj().T
        if nargout >= 2:
            return [_out(R, x), MatArray.scalar(0.0)]
        return _out(R, x)
    except np.linalg.LinAlgError:
        if nargout >= 2:
            return [MatArray.empty(), MatArray.scalar(1.0)]
        raise MatError("MATLAB:posdef", "Matrix must be positive definite.")


@builtin("qr", category="math/linalg", min_in=1, max_in=2, pass_nargout=True)
def m_qr(x, opt=None, nargout=1):
    a = _f(x)
    economy = opt is not None and (
        (isinstance(opt, MatArray) and not is_text(opt) and opt.scalar_double() == 0) or
        (is_text(opt) and text_of(opt) in ("econ", "0")))
    mode = "reduced" if economy else "complete"
    Q, R = np.linalg.qr(a, mode=mode)
    if nargout <= 1:
        return _out(R, x)
    return [_out(Q, x), _out(R, x)]


@builtin("svd", category="math/linalg", min_in=1, max_in=2, pass_nargout=True)
def m_svd(x, opt=None, nargout=1):
    a = _f(x)
    economy = opt is not None and (
        (isinstance(opt, MatArray) and not is_text(opt) and opt.size and opt.scalar_double() == 0) or
        (is_text(opt) and text_of(opt) == "econ"))
    if nargout <= 1:
        s = np.linalg.svd(a, compute_uv=False)
        return _out(s.reshape(-1, 1), x)
    U, s, Vh = np.linalg.svd(a, full_matrices=not economy)
    S = np.zeros((U.shape[1], Vh.shape[0]), dtype=np.float64)
    np.fill_diagonal(S, s)
    return [_out(U, x), _out(S, x), _out(Vh.conj().T, x)]


@builtin("eig", category="math/linalg", min_in=1, max_in=2, pass_nargout=True)
def m_eig(x, b=None, nargout=1):
    a = _sq(x, "eig")
    if b is not None:
        bb = _sq(b, "eig")
        try:
            w, v = np.linalg.eig(np.linalg.solve(bb, a))
        except np.linalg.LinAlgError:
            raise MatError("MATLAB:eig:matrixMustBeFinite", "Generalized eig failed.")
    else:
        herm = np.allclose(a, a.conj().T)
        if herm:
            w, v = np.linalg.eigh(a)
        else:
            w, v = np.linalg.eig(a)
    if nargout <= 1:
        return _out(np.asarray(w).reshape(-1, 1), x)
    W = np.zeros((len(w), len(w)), dtype=np.complex128)
    np.fill_diagonal(W, w)
    return [_out(v, x), _out(W, x)]


@builtin("schur", category="math/linalg", min_in=1, max_in=2, pass_nargout=True)
def m_schur(x, opt=None, nargout=1):
    a = _sq(x, "schur")
    # numpy lacks schur; use eig-based quasi form for symmetric, else hessenberg-ish
    herm = np.allclose(a, a.conj().T)
    if herm:
        w, v = np.linalg.eigh(a)
        T = np.diag(w)
        if nargout <= 1:
            return _out(T, x)
        return [_out(v, x), _out(T, x)]
    raise MatError("MATLAB:schur:unsupported",
                   "schur currently requires a symmetric matrix.")


@builtin("expm", category="math/linalg", min_in=1, max_in=1)
def m_expm(x):
    a = _sq(x, "expm")
    # scaling & squaring with Pade(13)
    norm = np.linalg.norm(a, 1)
    s = max(0, int(np.ceil(np.log2(norm / 5.4))) if norm > 0 else 0)
    A = a / (2 ** s)
    b = [64764752532480000., 32382376266240000., 7771770303897600.,
         1187353796428800., 129060195264000., 10559470521600., 670442572800.,
         33522128640., 1323241920., 40840800., 960960., 16380., 182., 1.]
    I = np.eye(A.shape[0], dtype=A.dtype)
    A2 = A @ A
    A4 = A2 @ A2
    A6 = A4 @ A2
    U = A @ (A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2) +
             b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * I)
    V = A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2) + \
        b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * I
    R = np.linalg.solve(V - U, V + U)
    for _ in range(s):
        R = R @ R
    return _out(R, x)


@builtin("linsolve", category="math/linalg", min_in=2, max_in=3)
def m_linsolve(a, b, opts=None):
    from ..dispatch import mldivide
    return mldivide(a, b)


@builtin("dot", category="math/linalg", min_in=2, max_in=3)
def m_dot(a, b, dim=None):
    ha, hb = _f(a), _f(b)
    if dim is None and ha.ndim == 2 and (ha.shape[0] == 1 or ha.shape[1] == 1):
        return _out(np.vdot(ha.reshape(-1), hb.reshape(-1)), a)
    ax = scalar_int(dim) - 1 if dim is not None else 0
    return _out(np.sum(np.conj(ha) * hb, axis=ax, keepdims=True), a)


@builtin("cross", category="math/linalg", min_in=2, max_in=3)
def m_cross(a, b, dim=None):
    ha, hb = _f(a), _f(b)
    if dim is not None:
        ax = scalar_int(dim) - 1
    else:
        ax = next((i for i, s in enumerate(ha.shape) if s == 3), 0)
    return _out(np.cross(ha, hb, axis=ax), a)


@builtin("null", category="math/linalg", min_in=1, max_in=1)
def m_null(x):
    a = _f(x)
    U, s, Vh = np.linalg.svd(a)
    tol = max(a.shape) * np.finfo(float).eps * (s[0] if s.size else 0)
    ns = Vh[np.sum(s > tol):].conj().T
    return _out(ns, x)


@builtin("orth", category="math/linalg", min_in=1, max_in=1)
def m_orth(x):
    a = _f(x)
    U, s, _ = np.linalg.svd(a, full_matrices=False)
    tol = max(a.shape) * np.finfo(float).eps * (s[0] if s.size else 0)
    return _out(U[:, :int(np.sum(s > tol))], x)


@builtin("polyfit", category="math/poly", min_in=3, max_in=3)
def m_polyfit(x, y, n):
    xv = _f(x).reshape(-1)
    yv = _f(y).reshape(-1)
    deg = scalar_int(n)
    c = np.polyfit(xv.real, yv.real, deg)
    return MatArray(c.reshape(1, -1), "double")


@builtin("polyval", category="math/poly", min_in=2, max_in=2)
def m_polyval(p, x):
    pv = _f(p).reshape(-1)
    h = _f(x)
    return _out(np.polyval(pv, h), x)


@builtin("roots", category="math/poly", min_in=1, max_in=1)
def m_roots(p):
    pv = _f(p).reshape(-1)
    r = np.roots(pv)
    return MatArray(np.asarray(r, dtype=np.complex128).reshape(-1, 1)
                    if np.iscomplexobj(r) else r.reshape(-1, 1).astype(np.float64), "double")


@builtin("poly", category="math/poly", min_in=1, max_in=1)
def m_poly(r):
    h = _f(r)
    if h.ndim == 2 and h.shape[0] == h.shape[1] and h.shape[0] > 1:
        w = np.linalg.eigvals(h)
    else:
        w = h.reshape(-1)
    c = np.poly(w)
    return MatArray(np.atleast_2d(np.real_if_close(c)).astype(np.float64), "double")


@builtin("conv", category="math/signal", min_in=2, max_in=3)
def m_conv(a, b, shape=None):
    ha = _f(a).reshape(-1)
    hb = _f(b).reshape(-1)
    mode = text_of(shape) if shape is not None else "full"
    r = np.convolve(ha, hb, mode={"full": "full", "same": "same", "valid": "valid"}[mode])
    is_col = a.host().ndim == 2 and a.host().shape[1] == 1 and a.host().shape[0] > 1
    out = r.reshape(-1, 1) if is_col else r.reshape(1, -1)
    if not np.iscomplexobj(out):
        out = out.astype(np.float64)
    return MatArray(out, "double")
