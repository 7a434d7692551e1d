"""HIR resolution layer (≙ runmat-hir: binding tables, callable
resolution, entrypoint policy, dynamic-workspace gates)."""

from runmat_tpu.analysis import analyze_source
from runmat_tpu.frontend import hir
from runmat_tpu.frontend.parser import parse
from runmat_tpu.runtime import registry


def _lower(src: str) -> hir.HirAssembly:
    registry.ensure_loaded()
    return hir.lower(parse(src, "<t>"), registry=registry)


def test_entrypoint_policy():
    assert _lower("x = 1;").entry == "script"
    assert _lower("function y = f(x)\ny = x;\nend\n").entry == \
        "function-file"


def test_binding_kinds():
    asm = _lower("function y = f(a, b)\n"
                 "global G\n"
                 "persistent P\n"
                 "for k = 1:3\n"
                 "  y = a + k;\n"
                 "end\n"
                 "try\n"
                 "  z = b;\n"
                 "catch err\n"
                 "  z = 0;\n"
                 "end\n"
                 "end\n")
    u = asm.functions["f"]
    kinds = {n: b.kind for n, b in u.bindings.items()}
    assert kinds["a"] == "param" and kinds["b"] == "param"
    assert kinds["y"] == "output"
    assert kinds["G"] == "global" and kinds["P"] == "persistent"
    assert kinds["k"] == "loopvar"
    assert kinds["err"] == "catch"
    assert kinds["z"] == "local"


def test_callable_resolution_order():
    asm = _lower("r = helper(3) + sin(2) + mystery(1);\n"
                 "function y = helper(x)\ny = x * 2;\nend\n")
    main = asm.unit("<main>")
    assert main.calls["helper"] == "local-function"
    assert main.calls["sin"] == "builtin"
    assert main.calls["mystery"] == "unknown"


def test_variable_resolution_wins_over_builtin():
    asm = _lower("function y = f(x)\nsum = x;\ny = sum;\nend\n")
    u = asm.functions["f"]
    assert u.calls["sum"] == "variable"


def test_nested_function_resolution():
    asm = _lower("function y = outer(x)\n"
                 "y = inner(x);\n"
                 "  function z = inner(v)\n"
                 "  z = v + 1;\n"
                 "  end\n"
                 "end\n")
    u = asm.functions["outer"]
    assert u.calls["inner"] == "nested"


def test_dynamic_workspace_gate():
    asm = _lower("eval('x = 3');\ny = 1;")
    assert asm.unit("<main>").is_dynamic
    asm2 = _lower("y = 1;")
    assert not asm2.unit("<main>").is_dynamic


def test_anon_captures_propagate_reads():
    asm = _lower("c = 2; f = @(v) v * c + d;")
    main = asm.unit("<main>")
    read_names = {n for n, _, _ in main.reads}
    assert "c" in read_names and "d" in read_names
    assert "v" not in read_names          # parameter stays inside the anon


def test_shadowed_builtin_lint():
    findings = analyze_source("sum = 3; t = sum(1:10);", "<t>")
    assert any(f.identifier == "hir/ShadowedBuiltin" for f in findings)


def test_output_never_assigned_lint():
    findings = analyze_source("function [y, z] = f(x)\ny = x;\nend\n", "<t>")
    assert any(f.identifier == "hir/OutputNeverAssigned" and "'z'" in
               f.message for f in findings)
    clean = analyze_source("function [y, z] = f(x)\ny = x;\nz = 2;\nend\n",
                           "<t>")
    assert not any(f.identifier == "hir/OutputNeverAssigned"
                   for f in clean)


def test_dynamic_workspace_lint_is_info():
    findings = analyze_source("assignin('base', 'q', 4);", "<t>")
    hits = [f for f in findings if f.identifier == "hir/DynamicWorkspace"]
    assert hits and hits[0].severity == "info"
