"""Language-conformance tests (≙ runmat-vm/tests/{basics,loops,indexing,
closures,exceptions,globals_persistents}.rs — SURVEY.md §4.2)."""

import numpy as np
import pytest

from helpers import run, val, scalar, out, fails


# ----------------------------------------------------------------- arithmetic

def test_scalar_arith():
    assert scalar("x = 1 + 2 * 3 - 4 / 2;") == 5.0
    assert scalar("x = 2^10;") == 1024.0
    assert scalar("x = -2^2;") == -4.0
    assert scalar("x = mod(7, 3);") == 1.0
    assert scalar("x = mod(-1, 3);") == 2.0
    assert scalar("x = rem(-7, 3);") == -1.0


def test_matrix_arith():
    h = val("x = [1 2; 3 4] * [5 6; 7 8];")
    assert np.array_equal(h, np.array([[19, 22], [43, 50]]))
    h = val("x = [1 2; 3 4] .* [5 6; 7 8];")
    assert np.array_equal(h, np.array([[5, 12], [21, 32]]))


def test_broadcast_leading_dims():
    # MATLAB implicit expansion aligns leading dims
    h = val("a = ones(2, 3); b = [10; 20]; x = a + b;")
    assert np.array_equal(h, np.array([[11, 11, 11], [21, 21, 21]]))
    h = val("a = ones(2, 3, 2); b = [1; 2]; x = a + b; x = x(:, :, 1);")
    assert np.array_equal(h, np.array([[2., 2, 2], [3, 3, 3]]))


def test_division_forms():
    assert scalar("x = 10 / 4;") == 2.5
    assert scalar("x = 10 \\ 4;") == 0.4
    h = val("x = [2 0; 0 4] \\ [2; 8];")
    assert np.allclose(h, [[1.0], [2.0]])


def test_transpose():
    h = val("x = [1 2 3]';")
    assert h.shape == (3, 1)
    h = val("x = [1+2i 3]';")
    assert h[0, 0] == 1 - 2j
    h = val("x = [1+2i 3].';")
    assert h[0, 0] == 1 + 2j


def test_compare_and_logical():
    h = val("x = [1 2 3] > 2;")
    assert h.dtype == np.bool_
    assert np.array_equal(h, [[False, False, True]])
    assert scalar("x = double(true && false);") == 0.0
    assert scalar("x = double(true || false);") == 1.0
    assert scalar("x = double(xor(1, 0));") == 1.0


def test_short_circuit_skips_rhs():
    # rhs would error if evaluated
    assert scalar("a = []; x = double(~isempty(a) && a(1) > 0);") == 0.0


def test_integer_saturation():
    assert scalar("x = double(int8(100) + int8(100));") == 127.0
    assert scalar("x = double(uint8(5) - uint8(10));") == 0.0
    assert scalar("x = double(int8(7) / int8(2));") == 4.0  # rounds
    fails("x = int8(1) + int16(1);", "mixedClasses")


def test_single_propagation():
    s = run("x = single(1.5) + 2;")
    assert s.get("x").mclass == "single"
    # single + int errors in MATLAB
    fails("x = single(1) + int32(1);", "mixedClasses")


def test_char_arithmetic():
    assert scalar("x = 'a' + 1;") == 98.0
    s = run("x = ['a' 98];")
    assert s.get("x").mclass == "char"
    assert s.get("x").to_str() == "ab"


def test_complex():
    assert scalar("x = real(3 + 4i);") == 3.0
    assert scalar("x = imag(3 + 4i);") == 4.0
    assert scalar("x = abs(3 + 4i);") == 5.0
    h = val("x = sqrt(-4);")
    assert h[0, 0] == 2j


# ------------------------------------------------------------------ variables

def test_ans():
    s = run("3 + 4;")
    assert s.get("ans").scalar_double() == 7.0


def test_display_output():
    o = out("x = 42")
    assert "x =" in o and "42" in o
    o = out("x = 42;")
    assert o == ""


def test_undefined_variable():
    fails("y = undefined_thing_xyz + 1;", "UndefinedFunction")


# ---------------------------------------------------------------- control flow

def test_if_chain():
    src = """
function r = grade(s)
if s >= 90
  r = 1;
elseif s >= 80
  r = 2;
else
  r = 3;
end
end
"""
    s = run(src + "\nx = grade(95); y = grade(85); z = grade(10);")
    assert s.get("x").scalar_double() == 1
    assert s.get("y").scalar_double() == 2
    assert s.get("z").scalar_double() == 3


def test_while_break_continue():
    assert scalar("""
i = 0; x = 0;
while true
  i = i + 1;
  if i == 3, continue; end
  if i > 5, break; end
  x = x + i;
end
""") == 1 + 2 + 4 + 5


def test_for_range():
    assert scalar("x = 0; for i = 1:10, x = x + i; end") == 55.0
    assert scalar("x = 0; for i = 10:-2:1, x = x + i; end") == 10 + 8 + 6 + 4 + 2
    assert scalar("x = 0; for i = 1:0, x = 99; end") == 0.0  # empty loop


def test_for_over_matrix_columns():
    s = run("x = []; for c = [1 2; 3 4], x = [x; sum(c)]; end")
    assert np.array_equal(s.get("x").host(), [[4.0], [6.0]])


def test_nested_loops_break():
    assert scalar("""
x = 0;
for i = 1:3
  for j = 1:3
    if j == 2, break; end
    x = x + 1;
  end
end
""") == 3.0


def test_switch():
    src = """
function r = f(k)
switch k
  case 1
    r = 10;
  case {2, 3}
    r = 20;
  case 'hello'
    r = 30;
  otherwise
    r = 0;
end
end
"""
    s = run(src + "\na = f(1); b = f(3); c = f('hello'); d = f(99);")
    assert [s.get(n).scalar_double() for n in "abcd"] == [10, 20, 30, 0]


def test_try_catch():
    s = run("""
try
  error('my:id', 'boom %d', 42);
catch err
  msg = err.message;
  id = err.identifier;
end
""")
    assert s.get("msg").to_str() == "boom 42"
    assert s.get("id").to_str() == "my:id"


def test_try_without_var():
    assert scalar("x = 0; try, error('a:b', 'oops'); x = 5; catch, x = 1; end") == 1.0


def test_rethrow():
    fails("""
try
  error('a:b', 'original');
catch err
  rethrow(err);
end
""", "a:b")


# ------------------------------------------------------------------- functions

def test_function_basic():
    assert scalar("function y = sq(u)\ny = u^2;\nend\nx = sq(5);") == 25.0


def test_multiple_outputs():
    s = run("""
function [a, b, c] = f()
a = 1; b = 2; c = 3;
end
[p, q] = f();
""")
    assert s.get("p").scalar_double() == 1
    assert s.get("q").scalar_double() == 2


def test_tilde_output():
    assert scalar("""
function [a, b] = f()
a = 1; b = 2;
end
[~, x] = f();
""") == 2.0


def test_varargin_varargout():
    s = run("""
function varargout = f(varargin)
for k = 1:nargin
  varargout{k} = varargin{k} * 2;
end
end
[a, b] = f(1, 2);
""")
    assert s.get("a").scalar_double() == 2
    assert s.get("b").scalar_double() == 4


def test_nargin_nargout():
    s = run("""
function [n, m] = f(a, b, c)
n = nargin; m = nargout;
end
[x, y] = f(1, 2);
""")
    assert s.get("x").scalar_double() == 2
    assert s.get("y").scalar_double() == 2


def test_recursion():
    assert scalar("""
function r = fact(n)
if n <= 1
  r = 1;
else
  r = n * fact(n - 1);
end
end
x = fact(6);
""") == 720.0


def test_value_semantics_args():
    # callee mutation must not affect caller
    assert scalar("""
function g(v)
v(1) = 99;
end
x = [1 2 3];
g(x);
x = x(1);
""") == 1.0


def test_output_not_assigned_error():
    fails("""
function y = f()
end
x = f();
""", "UndefinedFunction")


# ---------------------------------------------------------------- anon funcs

def test_anon_basic():
    assert scalar("f = @(u) u.^2 + 1; x = f(3);") == 10.0


def test_anon_capture_by_value():
    assert scalar("a = 10; f = @(u) u + a; a = 99; x = f(1);") == 11.0


def test_named_handle():
    assert scalar("f = @sin; x = f(0);") == 0.0
    assert scalar("x = feval(@cos, 0);") == 1.0


def test_handle_in_cellfun():
    h = val("x = cellfun(@(v) v * 2, {1, 2, 3});")
    assert np.array_equal(h, [[2, 4, 6]])


# ------------------------------------------------------- globals / persistents

def test_global():
    s = run("""
function setg(v)
global G
G = v;
end
function r = getg()
global G
r = G;
end
global G
G = 0;
setg(42);
x = getg();
""")
    assert s.get("x").scalar_double() == 42.0


def test_persistent():
    s = run("""
function r = counter()
persistent n
if isempty(n)
  n = 0;
end
n = n + 1;
r = n;
end
a = counter(); b = counter(); c = counter();
""")
    assert s.get("c").scalar_double() == 3.0


# ------------------------------------------------------------- cells / structs

def test_cell_basics():
    s = run("c = {1, 'two', [3 4]}; a = c{1}; b = c{2}; d = c{3};")
    assert s.get("a").scalar_double() == 1
    assert s.get("b").to_str() == "two"
    assert np.array_equal(s.get("d").host(), [[3, 4]])


def test_cell_expansion_args():
    assert scalar("c = {1, 2, 3}; x = max(c{2}, c{3});") == 3.0


def test_cell_expansion_in_matrix():
    h = val("c = {1, 2, 3}; x = [c{:}];")
    assert np.array_equal(h, [[1, 2, 3]])


def test_struct_basics():
    s = run("s.a = 1; s.b = 'hi'; x = s.a; y = s.b;")
    assert s.get("x").scalar_double() == 1
    assert s.get("y").to_str() == "hi"


def test_struct_nested_path():
    assert scalar("s.a.b.c = 7; x = s.a.b.c;") == 7.0


def test_struct_dynamic_field():
    assert scalar("s.foo = 5; n = 'foo'; x = s.(n);") == 5.0


def test_struct_fn():
    s = run("s = struct('a', 1, 'b', 2); x = s.a + s.b;")
    assert s.get("x").scalar_double() == 3


def test_struct_array_indexing():
    s = run("s(1).v = 1; s(2).v = 2; s(3).v = 3; x = s(2).v; n = numel(s);")
    assert s.get("x").scalar_double() == 2
    assert s.get("n").scalar_double() == 3


def test_cell_in_struct_path():
    assert scalar("s.c = {1, 2}; s.c{2} = 20; x = s.c{2};") == 20.0


def test_fieldnames_isfield():
    o = out("s.a = 1; s.b = 2; disp(double(isfield(s, 'a'))); disp(double(isfield(s, 'z')))")
    assert "1" in o.splitlines()[0] and "0" in o.splitlines()[1]


# -------------------------------------------------------------------- strings

def test_sprintf():
    assert out("fprintf('%d %s %.2f\\n', 42, 'ab', pi)") == "42 ab 3.14\n"


def test_sprintf_vectorized():
    assert out("fprintf('%d,', [1 2 3])") == "1,2,3,"


def test_string_concat_brackets():
    s = run("x = ['abc' 'def'];")
    assert s.get("x").to_str() == "abcdef"


def test_num2str_disp():
    assert out("disp(['v=' num2str(2.5)])") == "v=2.5\n"


def test_dq_strings():
    s = run('x = "hello" + " " + "world";')
    assert s.get("x").item() == "hello world"


def test_strcmp():
    assert scalar("x = double(strcmp('abc', 'abc'));") == 1.0
    assert scalar("x = double(strcmp('abc', 'abd'));") == 0.0
    assert scalar("x = double(strcmpi('ABC', 'abc'));") == 1.0


# -------------------------------------------------------------------- command

def test_command_syntax():
    run("format long")
    run("hold on")


def test_eval():
    assert scalar("eval('x = 21 * 2;');") == 42.0


def test_exist():
    assert scalar("a = 5; x = exist('a', 'var');") == 1.0
    assert scalar("x = exist('nonexistent_xyz', 'var');") == 0.0
    assert scalar("x = exist('sin', 'builtin');") == 5.0


def test_nested_function_reads_parent():
    s = run("""function r = outer(x)
n = 10;
r = inner(x);
    function y = inner(z)
    y = z + n;
    end
end
v = outer(5);""")
    assert scalar_of(s, "v") == 15.0


def test_nested_function_writes_shared_var():
    s = run("""function r = outer()
n = 1;
bump(); bump();
r = n;
    function bump()
    n = n + 1;
    end
end
v = outer();""")
    assert scalar_of(s, "v") == 3.0


def test_endless_sibling_functions_still_parse():
    s = run("function r = f(x)\nr = g(x) + 1;\nfunction r = g(x)\nr = x * 2;")
    s.run_source("v = f(4);", "t")
    assert scalar_of(s, "v") == 9.0


def scalar_of(s, name):
    h = s.get(name).host()
    return float(h.reshape(-1)[0].real)


def test_func2str_roundtrip():
    from helpers import run_get
    v = run_get("s = func2str(@(x) x.^2 + 1); f = str2func(s); y = f(3);"
                "n = nargin(@(a, b) a);", "s", "y", "n")
    assert v["s"].to_str().startswith("@(x)")
    assert v["y"].host()[0, 0] == 10.0
    assert v["n"].host()[0, 0] == 2.0


def test_multi_output_anonymous():
    from helpers import run_get
    v = run_get("[a, b] = cellfun(@(c) deal(c, c*2), {1, 2});"
                "f = @(x) max(x); [m, i] = f([3 9 1]);", "a", "b", "m", "i")
    assert v["a"].host().tolist() == [[1.0, 2.0]]
    assert v["b"].host().tolist() == [[2.0, 4.0]]
    assert v["m"].host()[0, 0] == 9.0
    assert v["i"].host()[0, 0] == 2.0


def test_mexception_family():
    from helpers import run_get
    v = run_get("e = MException('A:b', 'v=%d', 7); m = e.message;"
                "e2 = addCause(e, MException('C:d', 'inner')); n = numel(e2.cause);"
                "try, throw(MException('Q:q', 'qq')); catch err, i = err.identifier; end"
                "\nrep = getReport(MException('R:r', 'text'));",
                "m", "n", "i", "rep")
    assert v["m"].to_str() == "v=7"
    assert v["n"].host()[0, 0] == 1.0
    assert v["i"].to_str() == "Q:q"
    assert "text" in v["rep"].to_str()
