"""Warmup manifest (compile-cost control, VERDICT task 7) + shape-fact
propagation lints (task 8)."""

import json
import os

import numpy as np

from helpers import run


def test_warmup_record_and_replay(tmp_path, monkeypatch):
    """Fresh compiles record manifest entries; replay AOT-compiles them all
    (≙ pipeline warmup, backend/wgpu/warmup.rs:10 + cache/persist.rs)."""
    mp = str(tmp_path / "manifest.jsonl")
    monkeypatch.setenv("RUNMAT_TPU_WARMUP_MANIFEST", mp)
    # fresh engine: recording happens on FRESH compiles only (the global
    # engine's jit cache would otherwise satisfy these structures)
    from runmat_tpu.accel import active_engine, reset_engine, set_engine
    prev = active_engine()
    reset_engine()
    s = run("x = gpuArray(rand(512,1,'single')); y = gather(sum(sin(x))); "
            "A = gpuArray(magic(4) + 8*eye(4)); z = gather(norm(A\\(1:4)')); "
            "S = gpuArray(ones(32,1)); "
            "for t = 1:12, S = S .* 1.01 + 0.1; end\n"
            "g = gather(sum(S));", accelerate=True)
    entries = [json.loads(ln) for ln in open(mp)]
    kinds = {e["kind"] for e in entries}
    assert {"fusion", "dense", "loop"} <= kinds
    from runmat_tpu.accel import warmup as wu
    try:
        n = wu.replay(active_engine(), path=mp)
        assert n == len(entries) and n >= 4
    finally:
        set_engine(prev)


def test_warmup_manifest_dedupes(tmp_path, monkeypatch):
    mp = str(tmp_path / "m.jsonl")
    monkeypatch.setenv("RUNMAT_TPU_WARMUP_MANIFEST", mp)
    run("a = gather(gpuArray(1:100) + 1);", accelerate=True)
    n1 = len(open(mp).read().splitlines())
    run("a = gather(gpuArray(1:100) + 1);", accelerate=True)
    # second identical session compiles may hit the in-process cache or
    # re-record the same structure: the manifest must not grow
    assert len(open(mp).read().splitlines()) == n1


# ------------------------------------------------------------- shape facts

def _shape_findings(src):
    from runmat_tpu.analysis import analyze_source
    return [f for f in analyze_source(src)
            if f.identifier.split(":")[-1] in
            ("ShapeMismatch", "DimMismatch", "InnerDim")]


def test_facts_matrix_literal_with_variables():
    assert _shape_findings("a = [1 2 3]; b = [4 5]; c = [a; b];")
    assert not _shape_findings("a = [1 2 3]; b = [4 5 6]; c = [a; b];")


def test_facts_elementwise_dim_mismatch():
    assert _shape_findings("a = zeros(2, 3); b = ones(3, 3); c = a + b;")
    assert not _shape_findings("a = zeros(2, 3); b = ones(1, 3); c = a + b;")
    assert not _shape_findings("a = zeros(2, 3); c = a + 1;")


def test_facts_inner_dim():
    assert _shape_findings("a = zeros(2, 3); b = ones(4, 2); c = a * b;")
    assert not _shape_findings("a = zeros(2, 3); b = ones(3, 2); c = a * b;")


def test_facts_ranges_and_transpose():
    assert _shape_findings("x = 1:5; y = 1:4; z = x .* y;")
    assert not _shape_findings("x = 1:5; y = (1:5)'; z = x .* y;")  # expansion


def test_facts_control_flow_join_widens():
    src = ("if rand > 0.5, a = zeros(2,3); else, a = zeros(2,4); end\n"
           "b = a + ones(2,3);")
    assert not _shape_findings(src)   # width unknown after merge: no claim


def test_loop_gate_static_prequalification():
    """An ineligible loop site is scanned once, then never re-attempted
    (fact-based pre-qualification replacing trial-trace-every-entry)."""
    from runmat_tpu.accel import active_engine
    s = run("x = gpuArray(1:64);", accelerate=True)
    src = ("for outer = 1:20\n"
           "  for k = 1:10, disp_dummy{k} = k; end\n"   # cell write: ineligible
           "end")
    r = s.execute("disp_dummy = {};" + src)
    assert r.error is None
    code = s.last_code if hasattr(s, "last_code") else None
    # the hint map on the compiled unit marks the inner site 'never'
    # (indirect check: a second run goes through without device dispatches)
    eng = active_engine()
    d0 = eng.stats["dispatches"]
    r = s.execute("disp_dummy = {};" + src)
    assert r.error is None
    assert eng.stats["dispatches"] == d0


def test_bundled_manifest_replays_all(tmp_path, monkeypatch):
    """The committed bench manifest (benchmarks/warmup_manifest.jsonl) must
    replay 100% of its entries — a stale entry means the bench suite will
    hit the cold-compile cliff at driver time (VERDICT r2 #2)."""
    monkeypatch.setenv("RUNMAT_TPU_WARMUP_MANIFEST",
                       str(tmp_path / "empty.jsonl"))
    from runmat_tpu.accel import active_engine, reset_engine, set_engine
    from runmat_tpu.accel import warmup as wu
    bundled = wu.bundled_manifest_path()
    assert bundled, "committed warmup manifest missing"
    n_entries = sum(1 for ln in open(bundled) if ln.strip())
    prev = active_engine()
    reset_engine()
    from runmat_tpu.accel import init_engine
    eng = init_engine(platform="cpu")
    try:
        n = wu.replay_all(eng, budget_s=120)
        assert n == n_entries and n >= 10
    finally:
        set_engine(prev)


def test_session_init_budgeted_replay(tmp_path, monkeypatch):
    """RUNMAT_TPU_WARMUP_INIT_BUDGET>0 replays the manifest at session
    init (AOT; no device data) without breaking the session."""
    import json as _json
    mp = str(tmp_path / "m.jsonl")
    monkeypatch.setenv("RUNMAT_TPU_WARMUP_MANIFEST", mp)
    from runmat_tpu.accel import active_engine, reset_engine, set_engine
    prev = active_engine()
    reset_engine()
    s = run("q = gpuArray(rand(256,1,'single')); qq = gather(sum(exp(q)));",
            accelerate=True)
    assert os.path.exists(mp)
    monkeypatch.setenv("RUNMAT_TPU_WARMUP_INIT_BUDGET", "30")
    try:
        s2 = run("z = 1 + 1;", accelerate=True)
        assert float(np.asarray(s2.get("z").host()).ravel()[0]) == 2.0
    finally:
        set_engine(prev)


def test_fact_gate_skips_ineligible_loop_without_trace():
    """VERDICT r2 weak #8: the gate consults compile-time class facts — a
    loop whose body reads a cell array is stamped 'never' at compile time
    and takes ZERO trial traces (≙ runmat-mir/src/analysis/facts.rs)."""
    from runmat_tpu.accel import active_engine, init_engine, reset_engine, set_engine
    prev = active_engine()
    reset_engine()
    eng = init_engine(platform="cpu")
    try:
        before = eng.stats.get("loop_trace_attempts", 0)
        s = run("c = {1, 2, 3}; t = 0; "
                "for k = 1:64, t = t + c{1}; end", accelerate=True)
        assert float(np.asarray(s.get("t").host()).ravel()[0]) == 64.0
        assert eng.stats.get("loop_trace_attempts", 0) == before
        # char read through paren indexing passes the cheap bytecode scan —
        # only the class fact can prove ineligibility before the trace
        s2 = run("s = 'abcd'; t = 0; "
                 "for k = 1:32, t = t + s(1); end", accelerate=True)
        assert float(np.asarray(s2.get("t").host()).ravel()[0]) == 32.0 * 97
        assert eng.stats.get("loop_trace_attempts", 0) == before
    finally:
        set_engine(prev)


def test_fact_gate_stamps_are_present_and_eligible_loop_still_folds():
    from runmat_tpu.frontend.parser import parse
    from runmat_tpu.vm.compiler import Compiler
    prog = parse("c = {1}; s = 'hi'; x = ones(4,1);\n"
                 "for k = 1:16, y = c{1}; end\n"
                 "for k = 1:16, x = x + 1; end\n", "t")
    compiled = Compiler.compile_program(prog, "t")
    stamps = list(compiled.main.loop_facts.values())
    assert len(stamps) == 2
    nevers = [st["never"] for st in stamps]
    assert any(n and "cell" in n for n in nevers)      # cell loop: never
    assert any(n is None for n in nevers)              # numeric loop: ok
    # the numeric loop still goes through the device gate and folds
    from runmat_tpu.accel import active_engine, init_engine, reset_engine, set_engine
    prev = active_engine()
    reset_engine()
    eng = init_engine(platform="cpu")
    try:
        before = eng.stats.get("loop_trace_attempts", 0)
        s = run("x = gpuArray(ones(512, 1)); "
                "for k = 1:32, x = x .* 1.001 + 0.5; end "
                "t = gather(sum(x));", accelerate=True)
        assert eng.stats.get("loop_trace_attempts", 0) > before
        assert np.isfinite(float(np.asarray(s.get("t").host()).ravel()[0]))
    finally:
        set_engine(prev)
