"""Typed execution ABI (VERDICT r3 weak #8): ordered stream entries,
display events, workspace deltas, structured warnings, figures touched,
engine dispatch deltas — the execute_request protocol hosts consume
(≙ runmat-core run.rs:330-385 ExecutionOutcome, abi.rs:83-140)."""

import json

from runmat_tpu.server import handle_request
from runmat_tpu.session import Session


def _sess(**kw):
    return Session(accelerate=False, **kw)


def test_streams_ordered_with_kinds():
    s = _sess()
    o = s.execute_request(
        "fprintf('one\\n'); warning('RunMat:demo:id', 'careful');"
        "fprintf('two\\n');")
    assert o.ok
    kinds = [(e.kind, e.text) for e in o.streams]
    assert kinds[0][0] == "stdout" and "one" in kinds[0][1]
    assert kinds[1][0] == "stderr" and "careful" in kinds[1][1]
    assert kinds[2][0] == "stdout" and "two" in kinds[2][1]
    # timestamps are monotone
    ts = [e.t_ms for e in o.streams]
    assert ts == sorted(ts)
    # legacy concatenated output is byte-identical to execute()
    s2 = _sess()
    r = s2.execute("fprintf('one\\n'); warning('RunMat:demo:id', 'careful');"
                   "fprintf('two\\n');")
    assert r.output == o.output


def test_structured_warnings():
    s = _sess()
    o = s.execute_request("warning('RunMat:abc:xyz', 'value is %d', 7);")
    assert o.warnings == [{"identifier": "RunMat:abc:xyz",
                           "message": "value is 7"}]


def test_display_events_carry_metadata():
    s = _sess()
    o = s.execute_request("x = [1 2; 3 4]\ny = 'hello'\n")
    labels = {e.label: e.meta for e in o.display_events}
    assert labels["x"]["class"] == "double"
    assert labels["x"]["size"] == [2, 2]
    assert labels["y"]["class"] == "char"
    assert "preview" in labels["x"]


def test_workspace_delta_upserts_and_removals():
    s = _sess()
    s.execute_request("a = 1; b = ones(3); keep = 'x';")
    o = s.execute_request("a = a + 1; c = rand(2,5); clear b;")
    names = {u["name"]: u for u in o.workspace_delta.upserts}
    assert set(names) == {"a", "c"}           # keep untouched, b removed
    assert o.workspace_delta.removals == ["b"]
    assert names["c"]["size"] == [2, 5]
    assert names["c"]["class"] == "double"


def test_error_with_stack():
    s = _sess()
    o = s.execute_request(
        "function inner()\nerror('RunMat:demo:boom', 'bad');\nend\n"
        "function outer()\ninner();\nend\nouter();\n", "stacked.m")
    assert not o.ok
    assert o.error["identifier"] == "RunMat:demo:boom"
    assert isinstance(o.error["stack"], list)
    # wall time measured
    assert o.wall_ms >= 0.0


def test_figures_touched():
    s = _sess()
    o1 = s.execute_request("figure(3); plot(1:10);")
    assert 3 in o1.figures_touched
    o2 = s.execute_request("x = 1 + 1;")
    assert o2.figures_touched == []


def test_outcome_json_round_trip():
    s = _sess()
    o = s.execute_request("v = linspace(0, 1, 5)\nwarning('w:id', 'note');")
    d = json.loads(json.dumps(o.to_dict()))
    assert d["ok"] is True
    assert d["workspace_delta"]["upserts"][0]["name"] == "v"
    assert d["warnings"][0]["identifier"] == "w:id"
    assert all(e["kind"] in ("stdout", "stderr") for e in d["streams"])


def test_server_execute_abi_op():
    s = _sess()
    r = handle_request(s, {"id": 9, "op": "execute_abi",
                           "source": "q = magic(3)\n"})
    assert r["ok"] and r["id"] == 9
    assert r["workspace_delta"]["upserts"][0]["name"] == "q"
    assert r["display_events"][0]["label"] == "q"
    assert any("8" in e["text"] for e in r["streams"])


def test_engine_delta_reported_when_accelerated():
    import pytest
    try:
        s = Session(accelerate=True)
    except Exception:
        pytest.skip("no acceleration engine")
    from runmat_tpu.accel import active_engine
    if active_engine() is None:
        pytest.skip("no acceleration engine")
    o = s.execute_request(
        "A = gpuArray(rand(256, 256, 'single')); "
        "B = A * A; t = gather(sum(B(:)));")
    assert o.ok
    assert o.engine is not None
    assert any(k in o.engine for k in ("dispatches", "compiles",
                                       "cache_hits", "uploads", "gathers"))


def test_workspace_delta_preview_never_gathers():
    """The implicit upsert preview must not materialize device arrays:
    residency survives execute_request and the preview is synthetic."""
    import pytest
    try:
        s = Session(accelerate=True)
    except Exception:
        pytest.skip("no acceleration engine")
    from runmat_tpu.accel import active_engine
    if active_engine() is None:
        pytest.skip("no acceleration engine")
    o = s.execute_request("x = gpuArray(1:100); y = cumsum(x) + 1;")
    assert o.ok
    assert s.get("y").on_device            # preview did not gather
    up = {u["name"]: u for u in o.workspace_delta.upserts}
    assert up["y"]["on_device"] is True
    assert "gpuArray" in up["y"]["preview"]
