"""Parser conformance tests (≙ runmat-parser tests, SURVEY.md §4.1)."""

import pytest

from runmat_tpu.frontend import ast as A
from runmat_tpu.frontend.parser import parse, parse_expression
from runmat_tpu.errors import MatError


def expr(src):
    return parse_expression(src)


def test_precedence_arith():
    e = expr("1 + 2 * 3")
    assert isinstance(e, A.BinOp) and e.op == "+"
    assert isinstance(e.right, A.BinOp) and e.right.op == "*"


def test_precedence_range_vs_add():
    # 1:n+1 parses as 1:(n+1)
    e = expr("1:n+1")
    assert isinstance(e, A.Range)
    assert isinstance(e.stop, A.BinOp) and e.stop.op == "+"


def test_precedence_compare_vs_range():
    # a < 1:3 parses as a < (1:3)
    e = expr("a < 1:3")
    assert isinstance(e, A.BinOp) and e.op == "<"
    assert isinstance(e.right, A.Range)


def test_three_part_range():
    e = expr("1:2:10")
    assert isinstance(e, A.Range) and e.step is not None


def test_unary_power():
    # -2^2 == -(2^2)
    e = expr("-2^2")
    assert isinstance(e, A.UnOp) and e.op == "-"
    assert isinstance(e.operand, A.BinOp) and e.operand.op == "^"
    # 2^-1 parses
    e = expr("2^-1")
    assert isinstance(e, A.BinOp) and isinstance(e.right, A.UnOp)


def test_power_right_assoc():
    e = expr("2^3^2")
    assert isinstance(e.right, A.BinOp) and e.right.op == "^"


def test_matrix_space_split():
    e = expr("[1 -2]")
    assert len(e.rows[0]) == 2
    e = expr("[1 - 2]")
    assert len(e.rows[0]) == 1
    e = expr("[1-2]")
    assert len(e.rows[0]) == 1
    e = expr("[a' b]")
    assert len(e.rows[0]) == 2


def test_matrix_rows():
    e = expr("[1 2; 3 4]")
    assert len(e.rows) == 2 and len(e.rows[0]) == 2


def test_transpose_postfix():
    e = expr("A'")
    assert isinstance(e, A.PostOp) and e.op == "'"
    e = expr("A.'")
    assert isinstance(e, A.PostOp) and e.op == ".'"


def test_indexing_forms():
    e = expr("A(1, :, end)")
    assert isinstance(e, A.Index) and e.kind == "paren"
    assert isinstance(e.args[1], A.Colon) and isinstance(e.args[2], A.EndRef)
    e = expr("c{2}")
    assert isinstance(e, A.Index) and e.kind == "brace"


def test_end_arithmetic():
    e = expr("A(end-1)")
    arg = e.args[0]
    assert isinstance(arg, A.BinOp) and isinstance(arg.left, A.EndRef)


def test_field_chain():
    e = expr("s.a.b(2).c")
    assert isinstance(e, A.FieldAccess) and e.name == "c"


def test_dynamic_field():
    e = expr("s.(name)")
    assert isinstance(e, A.FieldAccess) and e.dynamic is not None


def test_anon_func():
    e = expr("@(x, y) x + y")
    assert isinstance(e, A.AnonFunc) and e.params == ["x", "y"]
    e = expr("@sin")
    assert isinstance(e, A.FuncHandle) and e.name == "sin"


def test_multi_assign():
    p = parse("[a, b] = size(x);")
    st = p.body[0]
    assert isinstance(st, A.MultiAssign) and len(st.lhs) == 2


def test_multi_assign_tilde():
    p = parse("[~, idx] = max(v);")
    st = p.body[0]
    assert st.lhs[0] is None


def test_display_flag():
    p = parse("x = 1\ny = 2;")
    assert p.body[0].display is True
    assert p.body[1].display is False


def test_if_elseif_else():
    p = parse("if a\nx=1;\nelseif b\nx=2;\nelse\nx=3;\nend")
    st = p.body[0]
    assert isinstance(st, A.If) and len(st.branches) == 2 and st.else_body


def test_for_while_switch_try():
    p = parse("""
for i = 1:3
  x = i;
end
while x > 0
  x = x - 1;
end
switch x
  case {1,2}
    y = 1;
  otherwise
    y = 0;
end
try
  z = f();
catch err
  z = 0;
end
""")
    types = [type(s) for s in p.body]
    assert types == [A.For, A.While, A.Switch, A.TryCatch]
    assert p.body[3].catch_var == "err"


def test_function_file():
    p = parse("""function [y, z] = f(a, b)
y = a + b;
z = a - b;
end

function q = g(x)
q = x * 2;
""")
    assert p.is_function_file
    assert set(p.functions) == {"f", "g"}
    assert p.functions["f"].outs == ["y", "z"]


def test_command_syntax():
    p = parse("hold on\nformat long")
    assert isinstance(p.body[0], A.Command) and p.body[0].args == ["on"]


def test_command_not_confused_with_expr():
    p = parse("x - 1")
    assert isinstance(p.body[0], A.ExprStmt)


def test_cell_literal():
    e = expr("{1, 'a'; [2 3], 4}")
    assert isinstance(e, A.CellLit) and len(e.rows) == 2


def test_parse_error_raises():
    with pytest.raises(MatError):
        parse("x = ;")


def test_benchmark_scripts_parse():
    import pathlib
    bench_dir = pathlib.Path("/root/reference/benchmarks")
    if not bench_dir.exists():
        pytest.skip("reference not mounted")
    for m in bench_dir.rglob("*.m"):
        parse(m.read_text(), str(m))
