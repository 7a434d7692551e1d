"""Turbine native scalar-loop tier: correctness vs the Python interpreter.

≙ reference runmat-turbine (Cranelift tier-2 with interpreter fallback,
turbine/src/compiler.rs, run.rs:812-832). Loops below the 64-iteration gate
run interpreted; these tests compare both paths on the same programs."""

import numpy as np
import pytest

import runmat_tpu.native as N
from helpers import run
from runmat_tpu.native import turbine


pytestmark = pytest.mark.skipif(turbine() is None,
                                reason="no C++ toolchain for libturbine")


def both_paths(src, names):
    s1 = run(src)
    lib = N._LIB
    N._LIB = None
    try:
        s2 = run(src)
    finally:
        N._LIB = lib
    out = []
    for n in names:
        v1 = s1.get(n).host()
        v2 = s2.get(n).host()
        np.testing.assert_array_equal(v1, v2)
        out.append(float(v1.reshape(-1)[0]))
    return out


def test_sum_of_squares_bit_identical():
    (s,) = both_paths("s = 0; for i = 1:10000, s = s + i^2; end", ["s"])
    assert s == 10000 * 10001 * 20001 / 6


def test_branches_and_transcendentals():
    vals = both_paths("""acc = 0; last = 0;
for k = 1:5000
  v = sin(k * 0.01) * exp(-k * 1e-4);
  if v > 0.5
    acc = acc + v;
  else
    acc = acc - 0.001;
  end
  last = v;
end""", ["acc", "last", "k"])
    assert vals[2] == 5000.0


def test_break_and_continue():
    vals = both_paths("""c = 0;
for k = 1:1000
  if mod(k, 3) == 0
    continue
  end
  c = c + 1;
  if k > 500
    break
  end
end""", ["c", "k"])
    assert vals[1] == 502.0


def test_non_uniform_iterable_falls_back():
    # non-uniform steps can't run natively; results must still be right
    (s,) = both_paths("s = 0; v = [1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512 "
                      "1 2 4 8 16 32 64 128 256 512]; "
                      "for k = v, s = s + k; end", ["s"])
    assert s == 7 * 1023.0


def test_array_op_in_body_falls_back():
    (s,) = both_paths("a = [1 2 3]; s = 0; "
                      "for k = 1:100, s = s + sum(a) * k; end", ["s"])
    assert s == 6 * 5050.0


def test_loop_writes_all_touched_vars():
    vals = both_paths("x = 0; y = 10; "
                      "for k = 1:200, x = x + 1; y = y - 0.5; end",
                      ["x", "y", "k"])
    assert vals == [200.0, -90.0, 200.0]


def test_native_loop_is_fast():
    import time
    run("z = 1;")      # warm imports/session init out of the measurement
    t0 = time.perf_counter()
    run("s = 0; for i = 1:2000000, s = s + sqrt(i); end")
    dt = time.perf_counter() - t0
    assert dt < 2.0    # interpreter would take ~80 s


# --- class/definedness invariants (ADVICE round 1, turbine_loop writeback) --- #

def test_never_taken_branch_does_not_create_variable():
    s = run("n = 0; for k = 1:100, if k > 1000, ghost = 1; end, n = n + 1; end")
    assert s.get("ghost") is None
    assert float(s.get("n").host()) == 100.0


def test_conditionally_stored_existing_var_updates():
    vals = both_paths("hits = 0; for k = 1:100, if mod(k,2)==0, "
                      "hits = hits + 1; end, end", ["hits"])
    assert vals[0] == 50.0


def test_logical_loop_carried_keeps_class():
    s = run("flag = true; for k = 1:100, flag = ~flag; end")
    v = s.get("flag")
    assert v.mclass == "logical"
    assert float(v.host()) == 1.0


def test_logical_valued_store_keeps_class():
    # comparison result stored to a fresh variable inside the loop
    s = run("for k = 1:100, isbig = k > 50; end")
    assert s.get("isbig").mclass == "logical"


def test_single_loop_carried_keeps_class_and_precision():
    s = run("x = single(0); for k = 1:100, x = x + single(0.1); end")
    v = s.get("x")
    assert v.mclass == "single"
    assert abs(float(v.host()) - np.float32(sum([np.float32(0.1)] * 100,
                                                np.float32(0)))) < 1e-6


def test_read_of_undefined_var_in_loop_errors():
    from helpers import fails
    fails("for k = 1:100, zz = undefined_thing_q + 1; "
          "undefined_thing_q = 5; end")


def test_logical_readonly_var_in_arithmetic_ok():
    vals = both_paths("on = true; s = 0; for k = 1:100, s = s + on * k; end",
                      ["s"])
    assert vals[0] == 5050.0


# --------------------------------------------------------------------------- #
# array element access (OP_LOADIDX / OP_STOREIDX)
# --------------------------------------------------------------------------- #

def test_turbine_indexed_read_write_parity():
    import numpy as np
    s = run("n = 5000; x = (1:n); y = zeros(1, n); s = 0; "
            "for k = 1:n, v = x(k) * 2 + sin(x(k) * 0.001); y(k) = v; "
            "s = s + v; end")
    y = s.get("y").host().reshape(-1)
    xs = np.arange(1, 5001, dtype=float)
    ref = xs * 2 + np.sin(xs * 0.001)
    np.testing.assert_allclose(y, ref, rtol=1e-14)
    assert abs(float(np.asarray(s.get("s").host()).reshape(-1)[0])
               - ref.sum()) < 1e-6


def test_turbine_indexed_write_growth_falls_back():
    # OOB write must grow the array through the interpreter (status 4 path)
    s = run("z = zeros(1, 5); for k = 1:100, z(k) = k; end; q = numel(z);")
    import numpy as np
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 100.0
    assert float(s.get("z").host().reshape(-1)[-1]) == 100.0


def test_turbine_indexed_matrix_linear_read():
    import numpy as np
    s = run("A = magic(10); t = 0; for k = 1:100, t = t + A(k); end")
    ref = float(np.sum([[int(v) for v in row] for row in
                        s.get("A").host()]))
    assert float(np.asarray(s.get("t").host()).reshape(-1)[0]) == ref


def test_turbine_read_write_same_array_sees_updates():
    import numpy as np
    s = run("w = ones(1, 200); "
            "for k = 2:200, w(k) = w(k - 1) * 1.01; end")
    w = s.get("w").host().reshape(-1)
    np.testing.assert_allclose(w, 1.01 ** np.arange(200), rtol=1e-12)


def test_turbine_cow_on_shared_array():
    import numpy as np
    # b aliases a before the loop; writing a inside the loop must not
    # mutate b (value semantics / COW)
    s = run("a = (1:100); b = a; "
            "for k = 1:100, a(k) = a(k) + 1; end; d = sum(a - b);")
    assert float(np.asarray(s.get("d").host()).reshape(-1)[0]) == 100.0
    np.testing.assert_allclose(s.get("b").host().reshape(-1),
                               np.arange(1, 101))


def test_turbine_noninteger_subscript_errors():
    from runmat_tpu.session import Session
    s = Session(accelerate=False)
    r = s.execute("v = (1:64); t = 0; "
                  "for k = 1:64, t = t + v(k + 0.5); end")
    assert r.error is not None


# --------------------------------------------------------------------------- #
# native while loops + translation cache
# --------------------------------------------------------------------------- #

def test_turbine_while_newton():
    import numpy as np
    s = run("x = 100; it = 0; "
            "while abs(x*x - 2) > 1e-12, x = 0.5*(x + 2/x); it = it + 1; end")
    assert abs(float(np.asarray(s.get("x").host()).reshape(-1)[0])
               - 2 ** 0.5) < 1e-12
    assert float(np.asarray(s.get("it").host()).reshape(-1)[0]) > 5


def test_turbine_while_zero_trip():
    import numpy as np
    s = run("z = 5; w = 1; while z < 0, z = z - 1; w = 99; end")
    assert float(np.asarray(s.get("z").host()).reshape(-1)[0]) == 5.0
    assert float(np.asarray(s.get("w").host()).reshape(-1)[0]) == 1.0


def test_turbine_while_with_branches_collatz():
    import numpy as np
    s = run("cur = 27; c = 0; "
            "while cur > 1, if mod(cur, 2) == 0, cur = cur / 2; "
            "else, cur = 3*cur + 1; end, c = c + 1; end")
    assert float(np.asarray(s.get("c").host()).reshape(-1)[0]) == 111.0


def test_turbine_while_array_fill():
    import numpy as np
    s = run("buf = zeros(1, 500); i = 1; "
            "while i <= 500, buf(i) = i * i; i = i + 1; end")
    np.testing.assert_allclose(s.get("buf").host().reshape(-1),
                               np.arange(1, 501.0) ** 2)


def test_turbine_cache_reuse_across_entries():
    import numpy as np
    # the same while site re-entered 50 times with different state must
    # give per-entry-correct results (translation cache + state rebuild)
    s = run("out = zeros(1, 50); "
            "for j = 1:64, if j <= 50, cur = j; c = 0; "
            "while cur > 1, cur = cur - 1; c = c + 1; end, "
            "out(j) = c; end, end")
    np.testing.assert_allclose(s.get("out").host().reshape(-1),
                               np.arange(0, 50.0))


def test_turbine_while_nonscalar_condition_falls_back():
    import numpy as np
    s = run("v = (1:3); n = 0; while n < numel(v), n = n + 1; end")
    assert float(np.asarray(s.get("n").host()).reshape(-1)[0]) == 3.0


# --------------------------------------------------------------------------- #
# round 4: nested loops, 2-D indexing, inlined scalar helpers
# (≙ runmat-turbine/src/compiler.rs:249 compiling general bytecode)
# --------------------------------------------------------------------------- #

def test_turbine_2d_read_write_parity():
    s = run("A = magic(40); B = zeros(40, 40); t = 0; "
            "for k = 1:64, for i = 1:40, for j = 1:40, "
            "B(i, j) = A(i, j) * 2 + i - j; t = t + A(i, j); "
            "end, end, end")
    A = s.get("A").host()
    ref = A * 2 + (np.arange(1, 41)[:, None] - np.arange(1, 41)[None, :])
    np.testing.assert_allclose(s.get("B").host(), ref)
    assert float(np.asarray(s.get("t").host()).reshape(-1)[0]) == \
        64 * float(A.sum())


def test_turbine_gauss_seidel_native_speed():
    # a doubly-nested A(i,j) stencil must run native end-to-end
    import time
    t0 = time.perf_counter()
    s = run("n = 80; A = ones(n, n); "
            "for sweep = 1:200, for i = 2:n-1, for j = 2:n-1, "
            "A(i, j) = 0.25 * (A(i-1, j) + A(i+1, j) + A(i, j-1) "
            "+ A(i, j+1)); end, end, end")
    dt = time.perf_counter() - t0
    assert dt < 3.0   # ~2.4M stencil updates; interpreter takes minutes
    A = s.get("A").host()
    assert abs(float(A[40, 40]) - 1.0) < 1e-9   # all-ones fixed point


def test_turbine_nested_loop_parity_with_interpreter():
    vals = both_paths("acc = 0; "
                      "for i = 1:100, for j = 1:i, "
                      "acc = acc + j; end, end", ["acc", "i", "j"])
    assert vals[0] == sum(j for i in range(1, 101)
                          for j in range(1, i + 1))


def test_turbine_nested_float_range_endpoint_parity():
    # endpoint clamp of the native counting loop must mirror _make_range
    vals = both_paths("last = -1; c = 0; "
                      "for k = 1:100, for x = 0:0.1:1, "
                      "last = x; c = c + 1; end, end", ["last", "c"])
    assert vals[0] == 1.0          # clamped endpoint, not 0.1*10 rounding
    assert vals[1] == 1100.0


def test_turbine_nested_reverse_and_empty_ranges():
    vals = both_paths("s = 0; e = 0; "
                      "for k = 1:100, for d = 5:-1:1, s = s + d; end, "
                      "for q = 3:2, e = e + 1; end, end", ["s", "e"])
    assert vals[0] == 100 * 15.0
    assert vals[1] == 0.0


def test_turbine_nested_while_in_for():
    vals = both_paths("total = 0; "
                      "for k = 1:100, c = k; steps = 0; "
                      "while c > 1, if mod(c, 2) == 0, c = c / 2; "
                      "else, c = 3 * c + 1; end, steps = steps + 1; end, "
                      "total = total + steps; end", ["total"])
    assert vals[0] > 0


def test_turbine_inlined_scalar_helper():
    import time
    src = ("s = 0; for k = 1:300000, s = s + damp(k); end\n"
           "function y = damp(x)\n"
           "  y = sin(x * 1e-3) * exp(-x * 1e-6);\n"
           "end")
    t0 = time.perf_counter()
    s1 = run(src)
    dt = time.perf_counter() - t0
    assert dt < 2.0   # inlined native; interpreted call costs ~10 us each
    lib = N._LIB
    N._LIB = None
    try:
        s2 = run("s = 0; for k = 1:100, s = s + damp(k); end\n"
                 "function y = damp(x)\n"
                 "  y = sin(x * 1e-3) * exp(-x * 1e-6);\n"
                 "end")
    finally:
        N._LIB = lib
    ks = np.arange(1, 300001, dtype=float)
    ref = float(np.sum(np.sin(ks * 1e-3) * np.exp(-ks * 1e-6)))
    assert abs(float(np.asarray(s1.get("s").host()).reshape(-1)[0])
               - ref) < 1e-9 * abs(ref)


def test_turbine_inlined_helper_with_branches_and_return():
    vals = both_paths(
        "t = 0; for k = 1:1000, t = t + clampit(k - 500); end\n"
        "function y = clampit(x)\n"
        "  if x < 0\n"
        "    y = 0;\n"
        "    return\n"
        "  end\n"
        "  y = x;\n"
        "end", ["t"])
    assert vals[0] == sum(max(k - 500, 0) for k in range(1, 1001))


def test_turbine_inlined_helper_calls_helper():
    vals = both_paths(
        "t = 0; for k = 1:500, t = t + f(k); end\n"
        "function y = f(x)\n"
        "  y = g(x) + 1;\n"
        "end\n"
        "function y = g(x)\n"
        "  y = x * 2;\n"
        "end", ["t"])
    assert vals[0] == sum(2 * k + 1 for k in range(1, 501))


def test_turbine_helper_shadowed_by_variable():
    # a variable named like the helper must win (MATLAB precedence)
    vals = both_paths(
        "damp = 7; t = 0; for k = 1:100, t = t + damp * k; end",
        ["t"])
    assert vals[0] == 7 * 5050.0


def test_turbine_user_override_of_intrinsic_not_miscompiled():
    # user-defined sin.m-style local function shadows the libm intrinsic
    vals = both_paths(
        "t = 0; for k = 1:100, t = t + sin(k); end\n"
        "function y = sin(x)\n"
        "  y = x + 1000;\n"
        "end", ["t"])
    assert vals[0] == 5050.0 + 100 * 1000


def test_turbine_multi_output_helper_falls_back():
    vals = both_paths(
        "t = 0; for k = 1:100, [a, b] = two(k); t = t + a + b; end\n"
        "function [u, v] = two(x)\n"
        "  u = x; v = 2 * x;\n"
        "end", ["t"])
    assert vals[0] == 3 * 5050.0


def test_turbine_2d_oob_write_falls_back_to_growth():
    s = run("M = zeros(3, 3); for k = 1:100, M(2, k) = k; end; "
            "q = size(M, 2);")
    assert float(np.asarray(s.get("q").host()).reshape(-1)[0]) == 100.0
    assert float(s.get("M").host()[1, 99]) == 100.0


def test_turbine_nested_loop_var_visible_after():
    vals = both_paths("for k = 1:100, for j = 2:5, end, end", ["k", "j"])
    assert vals == [100.0, 5.0]


def _path_session(tmp_path, src=None):
    from runmat_tpu.session import Session
    for fname, body in _DEEP_FILES.items():
        (tmp_path / fname).write_text(body)
    s = Session(accelerate=True)
    r = s.execute(f"addpath('{tmp_path}')")
    assert r.error is None
    return s


_DEEP_FILES = {
    "run_deep.m": """
function out = run_deep(n)
  acc = 0;
  for k = 1:n
    acc = acc + h1(k);
  end
  out = acc;
end
function y = h1(x), y = h2(x) + 1; end
function y = h2(x), y = h3(x) * 2; end
function y = h3(x), y = h4(x) + 0.5; end
function y = h4(x), y = h5(x); end
function y = h5(x), y = sqrt(x) + sin(x); end
""",
    "run_rec.m": """
function out = run_rec(n)
  acc = 0;
  for k = 1:n
    acc = acc + fibr(mod(k, 12));
  end
  out = acc;
end
function y = fibr(n)
  if n < 2
    y = n;
  else
    y = fibr(n - 1) + fibr(n - 2);
  end
end
""",
    "run_down.m": """
function out = run_down(n)
  out = down(n);
end
function y = down(n)
  if n <= 0
    y = 0;
  else
    y = down(n - 1) + 1;
  end
end
""",
}


def test_native_deep_helper_chain(tmp_path):
    """VERDICT r4 #7: helper chains past the old inline-depth-3 cap stay
    native (true CALL/RETN subroutines with frame-relative slots)."""
    if turbine() is None:
        pytest.skip("no native toolchain")
    s = _path_session(tmp_path)
    r = s.execute("a = run_deep(1000);")
    assert r.error is None, r.error
    ks = np.arange(1, 1001)
    ref = float(np.sum((np.sqrt(ks) + np.sin(ks) + 0.5) * 2 + 1))
    assert abs(float(s.get("a").host().reshape(-1)[0]) - ref) < 1e-9


def test_native_recursion(tmp_path):
    """Recursive user functions run native (impossible under inlining)."""
    if turbine() is None:
        pytest.skip("no native toolchain")
    s = _path_session(tmp_path)
    r = s.execute("b = run_rec(200);")
    assert r.error is None, r.error

    def fib(n):
        return n if n < 2 else fib(n - 1) + fib(n - 2)
    ref = sum(fib(k % 12) for k in range(1, 201))
    assert float(s.get("b").host().reshape(-1)[0]) == ref


def test_native_recursion_frame_overflow_falls_back(tmp_path):
    """Recursion deeper than the native frame stack returns status 5 and
    the interpreter re-runs the loop with identical results."""
    if turbine() is None:
        pytest.skip("no native toolchain")
    import sys
    s = _path_session(tmp_path)
    # > 256 native frames -> status 5 -> the interpreter re-runs the loop;
    # give Python the stack headroom the interpreted recursion needs
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(100_000)
    try:
        r = s.execute("c = run_down(300);")
        assert r.error is None, r.error
        assert float(s.get("c").host().reshape(-1)[0]) == 300.0
    finally:
        sys.setrecursionlimit(old_limit)


def test_native_deep_chain_speedup_vs_interpreter(tmp_path):
    """The VERDICT r4 #7 'done' bar: a loop the round-4 tier bailed on
    (helper depth > 3) runs >= 50x over the interpreter."""
    import time
    if turbine() is None:
        pytest.skip("no native toolchain")
    s = _path_session(tmp_path)
    s.execute("x = run_deep(50000);")          # compile + warm
    t0 = time.perf_counter()
    r = s.execute("x = run_deep(50000);")
    t_nat = time.perf_counter() - t0
    assert r.error is None, r.error
    saved_lib, saved_tried = N._LIB, N._TRIED
    try:
        N._LIB, N._TRIED = None, True
        from runmat_tpu.session import Session
        s2 = Session(accelerate=True)
        s2.execute(f"addpath('{tmp_path}')")
        t0 = time.perf_counter()
        r = s2.execute("x = run_deep(5000);")  # 10x smaller, scaled below
        t_int = (time.perf_counter() - t0) * 10
        assert r.error is None, r.error
    finally:
        N._LIB, N._TRIED = saved_lib, saved_tried
    assert t_int / t_nat >= 50, (t_nat, t_int)
