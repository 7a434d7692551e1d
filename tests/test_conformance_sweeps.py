"""Conformance sweeps: MATLAB edge semantics + device/host parity at 1e-10
(SURVEY.md §4 item 11 / BASELINE.json rtol target)."""

import numpy as np
import pytest

from helpers import run_get
from runmat_tpu.session import Session

EDGE_CASES = [
    # (source, var, expected) — expected: float | list (F-order) | str | bool
    ("x = int8(127) + int8(10);", "x", 127),
    ("x = uint8(5) - uint8(9);", "x", 0),
    ("x = sum([]);", "x", 0),
    ("x = prod([]);", "x", 1),
    ("x = any([]);", "x", False),
    ("x = all([]);", "x", True),
    ("x = -2^2;", "x", -4),
    ("x = 2^-2;", "x", 0.25),
    ("x = int32(7)/int32(2);", "x", 4),
    ("x = idivide(int32(7), int32(2));", "x", 3),
    ("x = mod(-7, 3);", "x", 2),
    ("x = rem(-7, 3);", "x", -1),
    ("x = zeros(2); x(3, 3) = 1; y = numel(x);", "y", 9),
    ("x = [1 2 3]; x(x > 1) = 0;", "x", [1, 0, 0]),
    ("x = 1:5; x(logical([1 0 1 0 1])) = [];", "x", [2, 4]),
    ("x = 'abc' + 0;", "x", [97, 98, 99]),
    ("x = 'abc'; x(2) = 'x';", "x", "axc"),
    ("x = reshape(1:6, [], 2); y = size(x, 1);", "y", 3),
    ("x = []; x(3) = 5; y = numel(x);", "y", 3),
    ("x = cat(3, [1 2], [3 4]); y = size(x, 3);", "y", 2),
    ("v = [1+2i]; w = v'; y = imag(w);", "y", -2),
    ("x = nthroot(-8, 3);", "x", -2),
    ("x = wrapToPi(3*pi);", "x", np.pi),
]


@pytest.mark.parametrize("src,var,want", EDGE_CASES,
                         ids=[c[0][:40] for c in EDGE_CASES])
def test_edge_semantics(src, var, want):
    v = run_get(src, var)[var]
    h = v.host()
    if isinstance(want, str):
        assert v.to_str() == want
    elif isinstance(want, bool):
        assert bool(h.reshape(-1)[0]) == want
    elif isinstance(want, list):
        flat = np.real(h.astype(np.complex128)).astype(float).reshape(-1, order="F")
        assert flat.tolist() == pytest.approx(want)
    else:
        assert float(np.real(h.reshape(-1)[0])) == pytest.approx(want)


PARITY_EXPRS = [
    "sin(A) + cos(A) .* exp(-A)",
    "A * B", "A'", "sum(A, 1)", "mean(A, 'all')",
    "max(A, [], 2)", "cumsum(A, 2)", "sqrt(abs(A))",
    "A .^ 2", "A ./ (B + 5)", "mod(A, 3)", "sort(A, 2)",
    "A(A > 0)", "reshape(A, 4, [])", "std(A, 0, 2)",
    "A(2, :)", "diag(A)", "norm(A(:))", "dot(A(:), B(:))",
]


@pytest.fixture(scope="module")
def parity_session():
    s = Session(accelerate=True)
    r = s.execute("rng(0); Ah = randn(4, 4); Bh = randn(4, 4);"
                  "A = gpuArray(Ah); B = gpuArray(Bh);")
    assert r.error is None
    return s


@pytest.mark.parametrize("expr", PARITY_EXPRS)
def test_device_host_parity(parity_session, expr):
    s = parity_session
    host_expr = expr.replace("A", "Ah").replace("B", "Bh")
    r1 = s.execute(f"d = gather({expr});")
    r2 = s.execute(f"h = {host_expr};")
    assert r1.error is None, r1.error
    assert r2.error is None, r2.error
    d, h = s.get("d").host(), s.get("h").host()
    assert d.shape == h.shape
    assert np.allclose(d, h, rtol=1e-10, atol=1e-12, equal_nan=True)


def test_complex_device_real_outputs():
    """Regression: abs/real/imag/angle of device complex arrays must see the
    full complex input (the unary exec used to pre-cast to the real output
    dtype, dropping the imaginary part)."""
    s = Session(accelerate=True)
    r = s.execute("C0 = [1+2i, 3-4i]; C = gpuArray(C0);"
                  "a = gather(abs(C)); i = gather(imag(C));"
                  "g = gather(angle(C)); q = gather(C .* conj(C));")
    assert r.error is None, r.error
    assert np.allclose(s.get("a").host(), np.abs([[1+2j, 3-4j]]))
    assert np.allclose(s.get("i").host(), [[2.0, -4.0]])
    assert np.allclose(s.get("g").host(), np.angle([[1+2j, 3-4j]]))
    assert np.allclose(np.real(s.get("q").host()), [[5.0, 25.0]])
