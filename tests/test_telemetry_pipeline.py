"""Logging/telemetry pipeline: EnvFilter subscriber, OTLP span export,
consent-gated run lifecycle events (≙ runmat-logging/src/lib.rs:1-40 +
runmat-telemetry/src/lib.rs:1-40)."""

import json
import logging

from runmat_tpu import telemetry
from runmat_tpu.session import Session


def test_span_nesting_and_trace_ids():
    telemetry.enable(True)
    try:
        with telemetry.span("outer", unit="t"):
            with telemetry.span("inner"):
                pass
        recs = telemetry.spans()[-2:]
        inner, outer = recs[0], recs[1]     # inner finishes first
        assert inner["span"] == "inner" and outer["span"] == "outer"
        assert inner["trace_id"] == outer["trace_id"]
        assert inner["parent_id"] == outer["span_id"]
        assert outer["parent_id"] is None
        assert outer["end_ns"] >= outer["start_ns"]
    finally:
        telemetry.enable(False)


def test_otlp_export_shape(tmp_path):
    telemetry.enable(True)
    try:
        with telemetry.span("runtime.execute", unit="demo"):
            pass
    finally:
        telemetry.enable(False)
    path = str(tmp_path / "otlp.jsonl")
    n = telemetry.export_otlp(path)
    assert n >= 1
    payload = json.loads(open(path).readline())
    rs = payload["resourceSpans"][0]
    svc = [a for a in rs["resource"]["attributes"]
           if a["key"] == "service.name"][0]
    assert svc["value"]["stringValue"] == "runmat-tpu"
    spans = rs["scopeSpans"][0]["spans"]
    assert any(s["name"] == "runtime.execute" for s in spans)
    s0 = spans[-1]
    assert len(s0["traceId"]) == 32 and len(s0["spanId"]) == 16
    assert int(s0["endTimeUnixNano"]) >= int(s0["startTimeUnixNano"])


def test_otlp_file_sink_streams_spans(tmp_path, monkeypatch):
    sink = str(tmp_path / "stream.jsonl")
    monkeypatch.setenv("RUNMAT_TPU_OTLP_FILE", sink)
    telemetry.enable(True)
    try:
        with telemetry.span("fusion.execute", n_ops=3):
            pass
    finally:
        telemetry.enable(False)
    lines = open(sink).readlines()
    assert lines
    payload = json.loads(lines[-1])
    sp = payload["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert sp["name"] == "fusion.execute"
    attrs = {a["key"]: a["value"] for a in sp["attributes"]}
    assert attrs["n_ops"]["intValue"] == "3"


def test_init_logging_env_filter(capsys):
    telemetry.init_logging("error,runmat_tpu.accel=debug")
    assert logging.getLogger("runmat_tpu").level == logging.ERROR
    assert logging.getLogger("runmat_tpu.accel").level == logging.DEBUG
    telemetry.init_logging("warning")   # restore


def test_json_log_format(capsys):
    telemetry.init_logging("info", json_format=True)
    try:
        telemetry.logger("runmat_tpu.test").info("hello %s", "world")
        err = capsys.readouterr().err
        rec = json.loads(err.strip().splitlines()[-1])
        assert rec["level"] == "info"
        assert rec["target"] == "runmat_tpu.test"
        assert rec["message"] == "hello world"
    finally:
        telemetry.init_logging("warning", json_format=False)


def test_run_lifecycle_events_consent_gated(tmp_path, monkeypatch):
    path = str(tmp_path / "events.jsonl")
    # without consent: nothing is written
    monkeypatch.delenv("RUNMAT_TPU_TELEMETRY", raising=False)
    monkeypatch.setenv("RUNMAT_TPU_TELEMETRY_FILE", path)
    s = Session(accelerate=False)
    s.execute("x = 1;")
    import os
    assert not os.path.exists(path)
    # with consent: started + finished with provider stats
    monkeypatch.setenv("RUNMAT_TPU_TELEMETRY", "1")
    s2 = Session(accelerate=False)
    s2.execute("y = 2 + 2;")
    s2.execute("error('boom:id', 'x')")
    events = [json.loads(ln) for ln in open(path)]
    kinds = [e["event"] for e in events]
    assert kinds.count("runtime.run.started") == 2
    assert kinds.count("runtime.run.finished") == 2
    fin = [e for e in events if e["event"] == "runtime.run.finished"]
    assert fin[0]["ok"] is True and fin[0]["wall_ms"] >= 0
    assert fin[1]["ok"] is False and fin[1]["error"] == "boom:id"
