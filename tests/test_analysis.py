"""Static-analysis lints (analyze_source ≙ runmat-static-analysis)."""

from runmat_tpu.analysis import analyze_source


def _idents(findings):
    return [f.identifier for f in findings]


def test_clean_source_no_findings():
    src = "x = 1:10;\ny = sum(x);\ndisp(y);\n"
    assert analyze_source(src) == []


def test_unknown_identifier():
    f = analyze_source("y = some_bogus_thing + 1;")
    assert "RunMat:check:UnknownIdentifier" in _idents(f)
    f2 = analyze_source("y = another_bogus_fn(3);")
    assert "RunMat:check:UnknownIdentifier" in _idents(f2)


def test_unused_variable_in_function_only():
    # scripts: workspace is the output, no unused lint
    assert analyze_source("a = 5;\nb = 2;\ndisp(b);\n") == []
    src = "function y = f(x)\ntemp = x * 2;\ny = x;\nend\n"
    f = analyze_source(src)
    assert "RunMat:check:UnusedVariable" in _idents(f)
    assert any("'temp'" in x.message for x in f)


def test_unreachable_code():
    src = ("function y = f(x)\ny = x;\nreturn;\nz = 1;\nend\n")
    f = analyze_source(src)
    assert "RunMat:check:Unreachable" in _idents(f)


def test_matrix_shape_mismatch():
    f = analyze_source("m = [1 2; 3];")
    assert "RunMat:check:ShapeMismatch" in _idents(f)
    assert analyze_source("m = [1 2; 3 4]; disp(m);") == []


def test_parse_error_reported():
    f = analyze_source("x = (1 +;")
    assert f and f[0].severity == "error"


def test_function_scope_params_and_outs():
    src = ("function out = g(a, b)\nout = a + b;\nend\n")
    assert analyze_source(src) == []


def test_indexed_write_counts_as_use():
    # A(2) = 5 creates and uses A; no unused warning for the base
    f = analyze_source("A = zeros(1, 3);\nA(2) = 5;\ndisp(A);\n")
    assert f == []


def test_lsp_diagnostics_include_lints():
    from runmat_tpu.lsp import diagnostics
    d = diagnostics("function y = f(x)\nq = 7;\ny = x;\nend\n")
    assert any("UnusedVariable" in x["message"] for x in d)
    assert all(x["severity"] == 3 for x in d)
