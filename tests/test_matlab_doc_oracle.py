"""Tier D6: MATLAB-documentation oracle battery (VERDICT r3 #10).

Unlike the Tier D option batteries (whose expectations are computed with a
numpy oracle in-test), every expectation here is a PINNED LITERAL taken
from documented MATLAB behavior, concentrated on the edge families where
numpy and MATLAB genuinely diverge — so a numpy-flavored implementation
bug cannot hide behind a numpy-flavored oracle (the round-2
NaN-descend-sort bug was exactly this class). Families: NaN ordering,
empty-array reductions, integer conversion rounding (round-half-AWAY —
numpy rounds half-to-even) and saturation, integer division, mod/rem sign
grids, complex ordering (abs, then angle), negative-base roots and logs
(complex results — numpy returns NaN), rounding families, string/char
comparison, isequal/isequaln, colon/linspace endpoints.

Each case cites the documented rule in a comment.
≙ the reference's doc-pinned descriptor suites
(crates/runmat-runtime/tests/descriptor_error_source_of_truth.rs,
SURVEY §4 item 3).
"""

import numpy as np
import pytest

from runmat_tpu.session import Session
from runmat_tpu.values import MatArray, StringArray

ASSERTIONS = {"count": 0}


def bump(n=1):
    ASSERTIONS["count"] += n


_SESS = None


def sess() -> Session:
    global _SESS
    if _SESS is None:
        _SESS = Session(accelerate=True)
    return _SESS


def ev(expr: str):
    s = sess()
    r = s.execute(f"__doc_r = {expr};")
    if r.error is not None:
        raise AssertionError(f"{expr} -> {r.error}")
    return s.get("__doc_r")


def ev_num(expr: str) -> np.ndarray:
    v = ev(expr)
    assert isinstance(v, MatArray), f"{expr} -> {type(v)}"
    return np.asarray(v.host())


def exact(expr: str, want_literal):
    """Pinned-literal equality including NaN positions and complex parts."""
    got = np.asarray(ev_num(expr), dtype=np.complex128).reshape(-1)
    want = np.asarray(want_literal, dtype=np.complex128).reshape(-1)
    assert got.shape == want.shape, f"{expr}: {got.shape} vs {want.shape}"
    g, w = np.nan_to_num(got, nan=1e300), np.nan_to_num(want, nan=1e300)
    np.testing.assert_allclose(g, w, rtol=1e-12, atol=1e-12, err_msg=expr)
    assert np.array_equal(np.isnan(got.real), np.isnan(want.real)), expr
    bump()


def approx(expr: str, want_literal, tol=1e-9):
    got = np.asarray(ev_num(expr), dtype=np.complex128).reshape(-1)
    want = np.asarray(want_literal, dtype=np.complex128).reshape(-1)
    assert got.shape == want.shape, f"{expr}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol, err_msg=expr)
    bump()


def klass(expr: str, want_class: str):
    s = sess()
    r = s.execute(f"__doc_c = class({expr});")
    assert r.error is None, f"class({expr}) -> {r.error}"
    got = s.get("__doc_c").to_str()
    assert got == want_class, f"class({expr}) = {got}, want {want_class}"
    bump()


def shape(expr: str, want_shape):
    v = ev_num(expr)
    assert tuple(v.shape) == tuple(want_shape), \
        f"size({expr}) = {v.shape}, want {want_shape}"
    bump()


def errs(stmt: str):
    s = sess()
    r = s.execute(stmt)
    assert r.error is not None, f"{stmt}: expected an error"
    bump()


def istrue(expr: str):
    v = ev_num(expr)
    assert v.size >= 1 and bool(np.all(v != 0)), f"{expr}: expected true"
    bump()


def isfalse(expr: str):
    v = ev_num(expr)
    assert bool(np.all(v == 0)), f"{expr}: expected false"
    bump()


# --------------------------------------------------------------------------- #
# 1. NaN ordering
# --------------------------------------------------------------------------- #

def test_nan_ordering_sort():
    # doc sort: "NaN values are placed last" for 'ascend'
    exact("sort([3 NaN 1 NaN 2])", [1, 2, 3, np.nan, np.nan])
    # doc sort: for 'descend', NaN values are placed FIRST
    exact("sort([3 NaN 1 NaN 2], 'descend')", [np.nan, np.nan, 3, 2, 1])
    exact("sort([NaN -Inf Inf 0])", [-np.inf, 0, np.inf, np.nan])
    exact("sort([NaN -Inf Inf 0], 'descend')", [np.nan, np.inf, 0, -np.inf])
    # sort indices track the NaN placement
    s = sess()
    r = s.execute("[__v, __i] = sort([2 NaN 1]);")
    assert r.error is None
    i = np.asarray(s.get("__i").host()).reshape(-1)
    assert list(i) == [3, 1, 2]
    bump()


def test_nan_ordering_unique_issorted():
    # doc unique: "unique treats NaN values as distinct" — each NaN kept,
    # placed at the end of the sorted result
    exact("unique([NaN 1 NaN 2 1])", [1, 2, np.nan, np.nan])
    # doc issorted: NaN is treated as greater than all other values
    istrue("issorted([1 2 NaN])")
    isfalse("issorted([NaN 1 2])")
    istrue("issorted([3 2 NaN], 'descend') == 0")  # NaN-first is descend-sorted
    istrue("issorted([NaN 3 2], 'descend')")


def test_nan_minmax():
    # doc max/min: "ignores NaN values" by default
    exact("max([1 NaN 3])", [3])
    exact("min([NaN NaN 2])", [2])
    exact("max([NaN NaN])", [np.nan])   # all-NaN -> NaN
    # doc: 'includenan' propagates NaN
    exact("max([1 NaN 3], [], 'includenan')", [np.nan])
    exact("min([1 NaN 3], [], 'includenan')", [np.nan])
    # doc binary max(X, Y): when one argument is NaN the OTHER is returned
    exact("max(NaN, 5)", [5])
    exact("min(5, NaN)", [5])
    exact("max(NaN, NaN)", [np.nan])
    # median includes NaN by default (-> NaN); omitnan drops them
    exact("median([1 2 NaN])", [np.nan])
    exact("median([1 2 NaN], 'omitnan')", [1.5])
    exact("mean([1 2 NaN])", [np.nan])
    exact("mean([1 2 NaN], 'omitnan')", [1.5])
    exact("sum([1 2 NaN], 'omitnan')", [3])
    exact("sum([NaN NaN], 'omitnan')", [0])   # doc: all-NaN omitnan sum is 0
    exact("mean([NaN NaN], 'omitnan')", [np.nan])  # 0/0 of surviving count


def test_nan_relational_isequal():
    # IEEE semantics MATLAB documents explicitly
    isfalse("NaN == NaN")
    istrue("NaN ~= NaN")
    isfalse("NaN < 1")
    isfalse("NaN >= 1")
    # doc isequal: "not equal if either contains NaN"; isequaln treats
    # NaN values as equal
    isfalse("isequal(NaN, NaN)")
    istrue("isequaln(NaN, NaN)")
    isfalse("isequal([1 NaN], [1 NaN])")
    istrue("isequaln([1 NaN], [1 NaN])")
    # doc isequal: numeric classes compare by VALUE across classes
    istrue("isequal(int8(5), 5)")
    istrue("isequal(single(2), 2)")
    # doc isequal: char compares equal to its code point as double
    istrue("isequal('A', 65)")


# --------------------------------------------------------------------------- #
# 2. Empty-array semantics
# --------------------------------------------------------------------------- #

def test_empty_reductions():
    # doc: sum of empty is 0, prod of empty is 1 (identity elements)
    exact("sum([])", [0])
    exact("prod([])", [1])
    # doc: mean/std/var/median of empty is NaN
    exact("mean([])", [np.nan])
    exact("median([])", [np.nan])
    exact("std([])", [np.nan])
    exact("var([])", [np.nan])
    # doc: max/min of [] is []
    shape("max([])", (0, 0))
    shape("min([])", (0, 0))
    # doc any/all: any([]) is false, all([]) is true (vacuous truth)
    isfalse("any([])")
    istrue("all([])")
    # doc norm: norm([]) is 0
    exact("norm([])", [0])
    # row-empty reductions keep the identity per column
    exact("sum(zeros(0, 3))", [0, 0, 0])
    exact("prod(zeros(0, 3))", [1, 1, 1])
    shape("sum(zeros(0, 3), 2)", (0, 1))
    exact("all(zeros(0, 3))", [1, 1, 1])
    exact("any(zeros(0, 3))", [0, 0, 0])


def test_empty_shapes_ops():
    shape("sort([])", (0, 0))
    shape("cumsum([])", (0, 0))
    shape("[[] []]", (0, 0))
    # concatenation with empty keeps the other operand
    exact("[[] 1 2]", [1, 2])
    exact("[zeros(1,0) 5]", [5])
    # doc colon: a:b with a > b is a 1x0 empty
    shape("5:4", (1, 0))
    shape("1:-1:2", (1, 0))
    # linspace with n=1 returns the ENDPOINT (doc: "returns x2")
    exact("linspace(1, 10, 1)", [10])
    shape("linspace(1, 10, 0)", (1, 0))


# --------------------------------------------------------------------------- #
# 3. Integer conversion, rounding, saturation
# --------------------------------------------------------------------------- #

def test_int_conversion_rounds_half_away():
    # doc int8 etc: "rounds to the nearest integer; values half way
    # between two integers round AWAY from zero" — numpy rounds half to
    # even, so every .5 case here diverges from a numpy oracle
    exact("int8(2.5)", [3])
    exact("int8(3.5)", [4])
    exact("int8(-2.5)", [-3])
    exact("int8(-3.5)", [-4])
    exact("uint8(0.5)", [1])
    exact("uint8(2.5)", [3])
    exact("int16(0.5)", [1])
    exact("int32(-0.5)", [-1])
    exact("int64(1.5)", [2])
    exact("uint16(3.5)", [4])
    # round() itself: same rule for doubles
    exact("round(0.5)", [1])
    exact("round(2.5)", [3])
    exact("round(-0.5)", [-1])
    exact("round(-2.5)", [-3])
    exact("round(1.5)", [2])


def test_int_saturation():
    # doc: "values outside the range saturate on overflow"
    exact("int8(200)", [127])
    exact("int8(-200)", [-128])
    exact("uint8(-5)", [0])
    exact("uint8(300)", [255])
    exact("int16(1e9)", [32767])
    exact("int8(127) + int8(1)", [127])
    exact("int8(-128) - int8(1)", [-128])
    exact("uint8(0) - uint8(7)", [0])
    exact("int8(100) * int8(2)", [127])
    exact("int8(-100) * int8(3)", [-128])
    # doc abs: "abs(int8(-128)) saturates to int8(127)"
    exact("abs(int8(-128))", [127])
    exact("-int8(-128)", [127])   # unary minus saturates the same way
    # double op int -> int class, rounded and saturated
    exact("int8(100) + 1.7", [102])
    klass("int8(100) + 1.7", "int8")
    exact("int8(100) + 100", [127])
    # Inf/NaN conversion: doc — Inf saturates, NaN maps to 0
    exact("int8(Inf)", [127])
    exact("int8(-Inf)", [-128])
    exact("int8(NaN)", [0])
    exact("uint8(NaN)", [0])


def test_int_division_and_idivide():
    # doc integer division: "rounds to the nearest integer" (away on .5)
    exact("int8(7) / int8(2)", [4])      # 3.5 -> 4
    exact("int8(-7) / int8(2)", [-4])    # -3.5 -> -4
    exact("int8(5) / int8(2)", [3])      # 2.5 -> 3
    exact("int16(100) / int16(8)", [13])  # 12.5 -> 13
    # doc idivide default 'fix' (toward zero); 'floor', 'ceil', 'round'
    exact("idivide(int8(7), int8(2))", [3])
    exact("idivide(int8(-7), int8(2))", [-3])
    exact("idivide(int8(7), int8(2), 'floor')", [3])
    exact("idivide(int8(-7), int8(2), 'floor')", [-4])
    exact("idivide(int8(7), int8(2), 'ceil')", [4])
    exact("idivide(int8(-7), int8(2), 'ceil')", [-3])
    exact("idivide(int8(7), int8(2), 'round')", [4])
    exact("idivide(int8(-7), int8(2), 'round')", [-4])
    # mixed integer classes error (doc: "both arguments must have the
    # same class, or one can be a scalar double")
    errs("__doc_e = int8(1) + int16(1);")
    # int + single is also an error in MATLAB
    errs("__doc_e = int8(1) + single(1);")


def test_int_class_propagation():
    klass("int8(1) + 1", "int8")
    klass("uint16(4) * 2", "uint16")
    klass("int32(5) / 2", "int32")
    klass("single(1) + 1", "single")
    klass("single(1) + single(1)", "single")
    klass("true + 1", "double")       # logical promotes to double
    klass("'a' + 1", "double")        # char promotes to double
    exact("'a' + 1", [98])
    exact("'abc' - 'a'", [0, 1, 2])
    klass("int8(1) + true", "int8")   # logical with int keeps int


# --------------------------------------------------------------------------- #
# 4. mod / rem sign semantics
# --------------------------------------------------------------------------- #

def test_mod_rem_signs():
    # doc: mod result takes the sign of the DIVISOR, rem of the DIVIDEND
    exact("mod(-5, 3)", [1])
    exact("rem(-5, 3)", [-2])
    exact("mod(5, -3)", [-1])
    exact("rem(5, -3)", [2])
    exact("mod(-5, -3)", [-2])
    exact("rem(-5, -3)", [-2])
    exact("mod(5, 3)", [2])
    exact("rem(5, 3)", [2])
    # doc: mod(a, 0) returns a; rem(a, 0) returns NaN (float inputs)
    exact("mod(5, 0)", [5])
    exact("mod(-5, 0)", [-5])
    exact("rem(5, 0)", [np.nan])
    # fractional divisors follow the same sign rules
    approx("mod(5.5, 2)", [1.5])
    approx("mod(-5.5, 2)", [0.5])
    approx("rem(-5.5, 2)", [-1.5])
    approx("mod(5.5, -2)", [-0.5])
    # integer classes: same sign rules, saturating class result
    exact("mod(int8(-5), int8(3))", [1])
    exact("rem(int8(-5), int8(3))", [-2])
    klass("mod(int8(-5), int8(3))", "int8")


def test_fix_floor_ceil_negative():
    # doc fix: rounds toward zero
    exact("fix(-2.7)", [-2])
    exact("fix(2.7)", [2])
    exact("fix(-0.5)", [0])
    exact("floor(-2.3)", [-3])
    exact("ceil(-2.3)", [-2])
    exact("floor(2.7)", [2])
    exact("ceil(2.3)", [3])
    # round with digits: round(X, N) rounds to N digits right of the point
    approx("round(3.14159, 2)", [3.14])
    approx("round(2.5, 0)", [3])
    approx("round(12345.6789, -2)", [12300])
    # doc 'significant': N significant digits
    approx("round(1234, 2, 'significant')", [1200])
    approx("round(0.012345, 3, 'significant')", [0.0123])


# --------------------------------------------------------------------------- #
# 5. Complex results from real inputs (numpy returns NaN for these)
# --------------------------------------------------------------------------- #

def test_negative_base_complex_results():
    # doc sqrt: "sqrt(-4) returns 2i" (complex result, not NaN)
    exact("sqrt(-4)", [2j])
    # doc power: noninteger power of a negative base is the principal
    # complex root: (-8)^(1/3) = 1 + 1.7321i
    approx("(-8)^(1/3)", [1.0 + 1.7320508075688772j], tol=1e-9)
    # nthroot returns the REAL root instead
    exact("nthroot(-8, 3)", [-2])
    # doc log: log of a negative number is complex: log(-1) = pi*i
    approx("log(-1)", [np.pi * 1j])
    approx("log(-exp(1))", [1 + np.pi * 1j])
    approx("log2(-2)", [1 + np.pi / np.log(2) * 1j])
    approx("log10(-10)", [1 + np.pi / np.log(10) * 1j])
    # acos/asin outside [-1,1] are complex
    approx("acos(2)", [1.3169578969248166j])
    approx("asin(2)", [np.pi / 2 - 1.3169578969248166j])
    # but realsqrt/reallog error on negative input
    errs("__doc_e = realsqrt(-1);")
    errs("__doc_e = reallog(-1);")
    errs("__doc_e = realpow(-8, 1/3);")


def test_complex_ordering():
    # doc sort: "sorts complex by abs(...), ties by angle(...)"
    exact("sort([3i, 2, -2])", [2, -2, 3j])  # abs 2,2,3; tie: angle 0 < pi
    exact("sort([-1, 1, 1i])", [1, 1j, -1])  # angle 0 < pi/2 < pi
    # doc max of complex: by magnitude, ties by phase angle
    exact("max([1+1i, 2])", [2])
    exact("max([2i, -2])", [-2])             # equal abs, angle pi > pi/2
    exact("min([2i, -2])", [2j])
    # doc abs/angle of complex
    exact("abs(3+4i)", [5])
    approx("angle(-1)", [np.pi])
    approx("angle(1i)", [np.pi / 2])
    # doc: relational < > are undefined-for-complex — MATLAB uses REAL
    # part only for complex comparisons
    istrue("1+10i < 2")
    isfalse("3+0i < 2")


def test_special_value_arithmetic():
    exact("0^0", [1])                  # doc power: 0^0 is 1
    exact("Inf^0", [1])
    exact("NaN^0", [1])                # doc: x^0 is 1 for all x incl NaN
    exact("1^Inf", [1])                # doc: 1^y is 1 for all y
    exact("0^-1", [np.inf])
    exact("(-0)^-1", [-np.inf])
    exact("Inf + -Inf", [np.nan])
    exact("0 * Inf", [np.nan])
    exact("Inf / Inf", [np.nan])
    exact("1/0", [np.inf])
    exact("-1/0", [-np.inf])
    exact("0/0", [np.nan])
    # doc hypot: "hypot(Inf, NaN) returns Inf" (Inf dominates NaN)
    exact("hypot(Inf, NaN)", [np.inf])
    exact("hypot(NaN, Inf)", [np.inf])
    exact("hypot(3, 4)", [5])
    # doc atan2 quadrants
    approx("atan2(0, -1)", [np.pi])
    approx("atan2(1, 0)", [np.pi / 2])
    approx("atan2(-1, 0)", [-np.pi / 2])
    exact("atan2(0, 1)", [0])
    # sign
    exact("sign(-3)", [-1])
    exact("sign(0)", [0])
    exact("sign(NaN)", [np.nan])
    exact("sign(-Inf)", [-1])
    # doc mod identity: mod(Inf-involving) cases
    exact("mod(Inf, 2)", [np.nan])
    exact("rem(1, Inf)", [1])
    exact("mod(1, Inf)", [1])
    exact("mod(-1, Inf)", [np.inf])    # sign of divisor: -1 mod Inf = Inf


# --------------------------------------------------------------------------- #
# 6. String / char comparison & ordering
# --------------------------------------------------------------------------- #

def test_char_string_compare():
    # strcmp is NOT a <=> comparator: returns 1 only on exact match
    istrue("strcmp('abc', 'abc')")
    isfalse("strcmp('abc', 'ABC')")
    istrue("strcmpi('abc', 'ABC')")
    istrue("strncmp('abcdef', 'abcxyz', 3)")
    isfalse("strncmp('abcdef', 'abcxyz', 4)")
    istrue("strncmpi('ABCdef', 'abcXYZ', 3)")
    # doc strcmp: comparing char with [] is 0, not an error
    isfalse("strcmp('a', [])")
    # char relational compares code points elementwise
    exact("'abc' < 'abd'", [0, 0, 1])
    exact("'a' == 97", [1])
    # string scalars compare lexicographically with < >
    istrue('"apple" < "banana"')
    isfalse('"b" < "a"')
    istrue('"Zoo" < "apple"')   # 'Z' (90) < 'a' (97): ASCII ordering
    # string equality across char/string types
    istrue("\"abc\" == 'abc'")
    # empty char '' is 0x0 char; string("") is 1x1 with 0-length text
    shape("''", (0, 0))
    istrue("strlength(\"\") == 0")
    istrue("isempty('')")
    isfalse("isempty(\"\")")


def test_string_missing_and_sort():
    # doc string: missing string sorts LAST; ismissing detects it
    s = sess()
    r = s.execute('__doc_sm = sort(["b", string(missing), "a"]);')
    assert r.error is None
    v = s.get("__doc_sm")
    assert isinstance(v, StringArray)
    items = v.to_list() if hasattr(v, "to_list") else list(v.data.reshape(-1))
    assert items[0] == "a" and items[1] == "b", items
    assert items[2] is None or (isinstance(items[2], float)) or \
        str(items[2]) in ("<missing>", "None", "nan"), items
    bump()
    istrue('ismissing(string(missing))')
    isfalse('ismissing("abc")')
    # doc: missing ~= anything, even itself (NaN-like)
    isfalse('string(missing) == string(missing)')
    # sort of cellstr is by code point
    r = s.execute("__doc_cs = sort({'b', 'A', 'a'});")
    assert r.error is None
    cs = s.get("__doc_cs")
    flat = [c.to_str() for c in np.asarray(cs.data).reshape(-1)]
    assert flat == ["A", "a", "b"], flat
    bump()
    # doc upper/lower only touch letters
    s2 = sess()
    r = s2.execute("__doc_u = upper('abc-123');")
    assert r.error is None and s2.get("__doc_u").to_str() == "ABC-123"
    bump()


# --------------------------------------------------------------------------- #
# 7. Colon / linspace endpoint rules
# --------------------------------------------------------------------------- #

def test_colon_endpoints():
    # doc colon: includes b when (b-a) is an integer multiple of step
    # within floating-point tolerance — 0:0.1:1 has exactly 11 points
    shape("0:0.1:1", (1, 11))
    exact("length(0:0.1:1)", [11])
    v = ev_num("0:0.1:1").reshape(-1)
    assert abs(v[-1] - 1.0) < 1e-12   # endpoint hit exactly-ish
    bump()
    shape("1:0.3:2", (1, 4))          # 1, 1.3, 1.6, 1.9 — 2 NOT included
    exact("1:5", [1, 2, 3, 4, 5])
    exact("5:-1:1", [5, 4, 3, 2, 1])
    exact("1:0", np.zeros((0,)))
    # linspace always includes both endpoints
    v = ev_num("linspace(0, 1, 5)").reshape(-1)
    assert v[0] == 0.0 and v[-1] == 1.0
    bump()
    exact("linspace(2, 2, 3)", [2, 2, 2])


# --------------------------------------------------------------------------- #
# 8. Logical & bit semantics
# --------------------------------------------------------------------------- #

def test_logical_bit_semantics():
    # doc logical: any nonzero (incl. negative, fractional) is true;
    # logical(NaN) errors
    istrue("logical(-0.5)")
    isfalse("logical(0)")
    errs("__doc_e = logical(NaN);")
    istrue("xor(true, false)")
    isfalse("xor(true, true)")
    exact("bitand(uint8(12), uint8(10))", [8])
    exact("bitor(uint8(12), uint8(10))", [14])
    exact("bitxor(uint8(12), uint8(10))", [6])
    exact("bitshift(uint8(1), 3)", [8])
    exact("bitshift(uint8(255), -4)", [15])
    # doc bitshift: shifting beyond width gives 0; saturating class kept
    exact("bitshift(uint8(255), 9)", [0])
    klass("bitand(uint8(12), uint8(10))", "uint8")
    # doc bitcmp: complement within the class width
    exact("bitcmp(uint8(0))", [255])
    exact("bitcmp(uint8(200))", [55])
    # true/false arrays are logical class
    klass("true(2)", "logical")
    klass("~[0 1]", "logical")
    # doc find on logicals returns double indices
    klass("find([0 1 1])", "double")
    exact("find([0 1 0 1])", [2, 4])


# --------------------------------------------------------------------------- #
# 9. Documented machine constants
# --------------------------------------------------------------------------- #

def test_machine_constants():
    exact("eps", [2.0 ** -52])
    exact("eps('single')", [2.0 ** -23])
    exact("eps(0)", [2.0 ** -1074])       # doc eps: next denormal above 0
    exact("realmin", [2.0 ** -1022])
    approx("realmax", [1.7976931348623157e308], tol=1e-15)
    exact("flintmax", [9007199254740992])  # 2^53
    exact("flintmax('single')", [16777216])
    exact("intmax('int8')", [127])
    exact("intmin('int8')", [-128])
    exact("intmax('uint8')", [255])
    exact("intmin('uint8')", [0])
    exact("intmax('int16')", [32767])
    exact("intmax('int32')", [2147483647])
    exact("intmax('uint32')", [4294967295])
    exact("intmax", [2147483647])          # doc: default class is int32
    klass("intmax('int8')", "int8")
    klass("intmin('uint16')", "uint16")
    approx("pi", [np.pi], tol=1e-15)


def test_factorial_primes_combinatorics():
    exact("factorial(0)", [1])
    exact("factorial(5)", [120])
    exact("factorial(171)", [np.inf])      # doc: overflows double at 171
    istrue("isfinite(factorial(170))")
    exact("nchoosek(5, 2)", [10])
    exact("nchoosek(0, 0)", [1])
    exact("primes(10)", [2, 3, 5, 7])
    isfalse("isprime(1)")                  # doc: 1 is not prime
    istrue("isprime(2)")
    isfalse("isprime(0)")
    # doc gcd: always nonnegative, accepts negatives; gcd(0,0) = 0
    exact("gcd(-12, 18)", [6])
    exact("gcd(0, 5)", [5])
    exact("gcd(0, 0)", [0])
    exact("lcm(4, 6)", [12])


def test_exact_linalg_identities():
    exact("det(eye(3))", [1])
    exact("det([1 2; 3 4])", [-2])
    exact("trace([1 2; 3 4])", [5])
    exact("rank(eye(3))", [3])
    exact("rank(ones(3))", [1])
    exact("norm([3 4])", [5])              # vector 2-norm
    exact("norm([3 4], 1)", [7])
    exact("norm([3 4], Inf)", [4])
    exact("norm([1 2; 3 4], 1)", [6])      # doc: max column sum
    exact("norm([1 2; 3 4], Inf)", [7])    # doc: max row sum
    approx("norm([1 2; 3 4], 'fro')", [np.sqrt(30)])
    exact("cross([1 0 0], [0 1 0])", [0, 0, 1])
    exact("dot([1 2 3], [4 5 6])", [32])
    exact("inv([2 0; 0 4])", [0.5, 0, 0, 0.25])
    exact("[2 0; 0 4] \\ [2; 4]", [1, 1])
    exact("polyval([1 2 3], 2)", [11])
    exact("kron([1 2], [1; 1])", [1, 2, 1, 2])


def test_cumulative_and_diff():
    exact("cumsum([1 2 3])", [1, 3, 6])
    exact("cumprod([1 2 3])", [1, 2, 6])
    # doc 'reverse': cumulative from the end
    exact("cumsum([1 2 3], 'reverse')", [6, 5, 3])
    exact("cumprod([1 2 3], 'reverse')", [6, 6, 3])
    exact("cummax([1 3 2])", [1, 3, 3])
    exact("cummin([3 1 2])", [3, 1, 1])
    # doc cummax/cummin: NaN values are ignored
    exact("cummax([2 NaN 1])", [2, 2, 2])
    exact("cummin([2 NaN 1])", [2, 2, 1])
    exact("diff([1 4 9])", [3, 5])
    exact("diff([1 4 9], 2)", [2])
    # doc any/all: NaN counts as NONZERO
    istrue("any([NaN])")
    istrue("all([NaN])")
    isfalse("all([NaN 0])")


def test_class_and_type_queries():
    istrue("ischar('a')")
    isfalse("ischar(\"a\")")
    istrue("isstring(\"a\")")
    isfalse("isstring('a')")
    istrue("isa(int8(1), 'integer')")
    istrue("isa(1, 'numeric')")
    istrue("isa(single(1), 'float')")
    isfalse("isa(int8(1), 'float')")
    istrue("isa(1, 'double')")
    klass("int8(1):int8(3)", "int8")       # colon keeps the integer class
    exact("int8(1):int8(3)", [1, 2, 3])
    klass("max(int8([1 2]))", "int8")
    klass("sum(int8([1 2]))", "int8")      # doc sum: native class for ints
    klass("sum(single([1 2]))", "single")
    klass("mean(int8([1 2]))", "double")   # doc mean: double for ints
    exact("double('A')", [65])
    exact("double(char(66))", [66])
    klass("char(65)", "char")
    # doc int division by ZERO saturates to the class limits
    exact("int8(5) / int8(0)", [127])
    exact("int8(-5) / int8(0)", [-128])
    exact("int8(0) / int8(0)", [0])
    exact("uint8(5) / uint8(0)", [255])
    # size/numel/ndims contracts
    exact("size(zeros(2, 3, 4), 3)", [4])
    exact("size(zeros(2, 3), 5)", [1])     # doc: trailing dims report 1
    exact("ndims(5)", [2])                 # doc: scalars are 1x1 (2-D)
    exact("numel('abc')", [3])
    exact("length(zeros(3, 7))", [7])      # doc length: max(size(X))


def test_string_builders():
    s = sess()
    # doc strcat: trailing whitespace of CHAR inputs is removed
    r = s.execute("__doc_sc = strcat('ab  ', 'cd');")
    assert r.error is None and s.get("__doc_sc").to_str() == "abcd"
    bump()
    r = s.execute("__doc_sc2 = deblank('ab  ');")
    assert r.error is None and s.get("__doc_sc2").to_str() == "ab"
    bump()
    r = s.execute("__doc_sc3 = strtrim('  a b  ');")
    assert r.error is None and s.get("__doc_sc3").to_str() == "a b"
    bump()
    r = s.execute("__doc_sc4 = blanks(3);")
    assert r.error is None and s.get("__doc_sc4").to_str() == "   "
    bump()
    r = s.execute("__doc_sc5 = dec2bin(5);")
    assert r.error is None and s.get("__doc_sc5").to_str() == "101"
    bump()
    exact("bin2dec('101')", [5])
    r = s.execute("__doc_sc6 = dec2hex(255);")
    assert r.error is None and s.get("__doc_sc6").to_str() == "FF"
    bump()
    exact("hex2dec('ff')", [255])
    # char matrix concat requires equal row lengths
    errs("__doc_e = ['ab'; 'c'];")
    shape("['ab'; 'cd']", (2, 2))


def test_doc_assertion_count():
    assert ASSERTIONS["count"] >= 300, ASSERTIONS["count"]
