"""MIR CFG + dataflow analyses (≙ runmat-mir analysis/{dataflow,
spawn_safety}.rs test strategy: hand-written snippets with known CFGs)."""

from runmat_tpu.frontend.parser import parse
from runmat_tpu.vm.compiler import Compiler
from runmat_tpu.vm import mir
from runmat_tpu.vm import bytecode as B
from runmat_tpu.analysis import analyze_source


def _compile(src: str):
    return Compiler.compile_program(parse(src, "<t>"), "<t>")


def test_straightline_single_block():
    unit = mir.build_mir(_compile("x = 1; y = x + 2;").main)
    assert len(unit.blocks) == 1
    assert unit.blocks[0].succs == []


def test_if_else_diamond():
    code = _compile("if a > 0, x = 1; else, x = 2; end; y = x;").main
    unit = mir.build_mir(code)
    # entry, then, else, join
    assert len(unit.blocks) >= 3
    entry = unit.blocks[0]
    assert len(entry.succs) == 2
    join = [b for b in unit.blocks if len(b.preds) >= 2]
    assert join, "diamond must rejoin"


def test_for_loop_back_edge():
    code = _compile("s = 0; for k = 1:10, s = s + k; end; disp(s)").main
    unit = mir.build_mir(code)
    has_back = any(s <= b.index for b in unit.blocks for s in b.succs)
    assert has_back, "loop must produce a back edge"


def test_while_loop_cfg_and_liveness():
    code = _compile("n = 0; while n < 5, n = n + 1; end; disp(n)").main
    unit = mir.build_mir(code)
    live_in, live_out = mir.liveness(unit)
    # n is live around the loop
    assert any("n" in li for li in live_in)


def test_reaching_definitions_join():
    code = _compile("if c, x = 1; else, x = 2; end; y = x;").main
    unit = mir.build_mir(code)
    ins = mir.reaching_definitions(unit)
    join = [b.index for b in unit.blocks if len(b.preds) >= 2]
    assert join
    xdefs = [pc for (nm, pc) in ins[join[0]] if nm == "x"]
    assert len(xdefs) == 2, "both branch definitions reach the join"


def test_unreachable_after_while_true_is_detected_or_empty():
    # code after `return` inside a function body
    src = ("function y = f(x)\n"
           "y = x;\n"
           "return\n"
           "y = 99;\n"
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert any(ident == "mir/UnreachableBlock" for _, ident, _ in findings)


def test_maybe_undefined_on_one_path():
    src = ("function y = f(c)\n"
           "if c > 0\n"
           "  t = 5;\n"
           "end\n"
           "y = t;\n"          # t undefined when c <= 0
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert any(ident == "mir/MaybeUndefined" and "'t'" in msg
               for _, ident, msg in findings)


def test_defined_on_all_paths_is_clean():
    src = ("function y = f(c)\n"
           "if c > 0\n"
           "  t = 5;\n"
           "else\n"
           "  t = 7;\n"
           "end\n"
           "y = t;\n"
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert not any(ident == "mir/MaybeUndefined" for _, ident, _ in findings)


def test_dead_store_in_function():
    src = ("function y = f(x)\n"
           "t = x * 2;\n"       # dead: t reassigned before any read
           "t = x + 1;\n"
           "y = t;\n"
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    dead = [msg for _, ident, msg in findings if ident == "mir/DeadStore"]
    assert any("'t'" in m for m in dead)


def test_output_store_is_not_dead():
    src = ("function y = f(x)\ny = x;\nend\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert not any(ident == "mir/DeadStore" for _, ident, _ in findings)


def test_loop_carried_store_is_not_dead():
    src = ("function s = f(n)\n"
           "s = 0;\n"
           "for k = 1:n\n"
           "  s = s + k;\n"
           "end\n"
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert not any(ident == "mir/DeadStore" for _, ident, _ in findings)


def test_spawn_capture_mutation_flagged():
    src = ("x = 1;\n"
           "h = parfeval(@() x + 1, 1);\n"
           "x = 2;\n")
    findings = mir.analyze_code(_compile(src).main)
    assert any(ident == "mir/SpawnCaptureMutated" and "'x'" in msg
               for _, ident, msg in findings)


def test_spawn_capture_no_mutation_clean():
    src = ("x = 1;\n"
           "h = parfeval(@() x + 1, 1);\n"
           "y = 2;\n")
    findings = mir.analyze_code(_compile(src).main)
    assert not any(ident == "mir/SpawnCaptureMutated"
                   for _, ident, _ in findings)


def test_analyze_source_integrates_mir():
    src = ("function y = f(c)\n"
           "if c > 0\n"
           "  t = 5;\n"
           "end\n"
           "y = t;\n"
           "end\n")
    findings = analyze_source(src, "<t>")
    assert any(f.identifier == "mir/MaybeUndefined" for f in findings)


def test_scripts_skip_maybe_undefined():
    # workspace may predefine variables for scripts (entrypoint policy)
    findings = analyze_source("y = t + 1;", "<t>")
    assert not any(f.identifier == "mir/MaybeUndefined" for f in findings)


def test_format_mir_runs():
    code = _compile("if c, x = 1; else, x = 2; end").main
    text = mir.format_mir(code)
    assert "bb0" in text and "JMP" in text


def test_try_catch_edge():
    code = _compile("try, x = risky(); catch e, x = 0; end; disp(x)").main
    unit = mir.build_mir(code)
    # TRY_PUSH block must have two successors (handler + fallthrough)
    tp = [b for b in unit.blocks
          if any(code.instrs[pc][0] == B.TRY_PUSH
                 for pc in range(b.start, b.end))]
    assert tp and len(tp[0].succs) == 2


def test_indexed_first_assignment_not_flagged():
    # y(3) = 5 on an undefined y is legal MATLAB (auto-grow)
    src = ("function y = f(n)\n"
           "for k = 1:n\n"
           "  y(k) = k * 2;\n"
           "end\n"
           "end\n")
    prog = _compile(src)
    findings = mir.analyze_code(prog.functions["f"])
    assert not any(ident == "mir/MaybeUndefined" for _, ident, _ in findings)
