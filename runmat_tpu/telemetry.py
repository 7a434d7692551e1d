"""Tracing spans + execution/provider telemetry.

Reference parity: runmat-logging (tracing subscriber + spans like
runtime.execute / runtime.lower / fusion.execute) and ProviderTelemetry
(runmat-accelerate-api/src/lib.rs:1337-1376 — dispatch counts, upload/download
bytes, cache hit/miss, bounded kernel-launch log), surfaced by
`accel-info --json`. Product telemetry is consent-gated and, in this
zero-egress build, writes local JSONL instead of shipping events.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional

_SPANS: list[dict] = []          # bounded ring of recent spans
_MAX_SPANS = 512
_ENABLED = os.environ.get("RUNMAT_TPU_TRACE") == "1"


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def span(name: str, **attrs):
    """Timing span (≙ tracing span). Cheap no-op unless tracing is enabled."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = {"span": name, "ms": (time.perf_counter() - t0) * 1e3, **attrs}
        _SPANS.append(rec)
        if len(_SPANS) > _MAX_SPANS:
            del _SPANS[:len(_SPANS) - _MAX_SPANS]


def spans() -> list[dict]:
    return list(_SPANS)


def snapshot(session=None) -> dict:
    """Full telemetry snapshot (≙ ProviderTelemetry + ExecutionStats)."""
    out: dict[str, Any] = {"spans": len(_SPANS)}
    from .accel import active_engine
    eng = active_engine()
    if eng is not None:
        out["provider"] = {
            "platform": eng.platform,
            "device": str(getattr(eng.device, "device_kind", eng.device)),
            **eng.stats,
        }
        # live HBM accounting + per-category dispatch stats + bounded
        # kernel-launch log (api lib.rs:1337-1376 parity)
        out["memory"] = eng.memory_info()
        out["residency"] = eng.residency.snapshot()
        out["categories"] = {
            k: {"dispatches": v[0], "enqueue_ms": round(v[1], 3)}
            for k, v in sorted(eng.category_stats.items())}
        out["launches"] = list(eng.launch_log)
    if session is not None:
        out["session"] = {
            "workspace_vars": len(session.base_frame.vars),
            "functions": len(session.functions),
            "classes": len(session.classes),
            "rng_counter": session.rng.counter,
        }
    return out


class EventLog:
    """Consent-gated product telemetry -> local JSONL (zero-egress build)."""

    def __init__(self, path: Optional[str], enabled: bool):
        self.path = path
        self.enabled = enabled and path is not None

    def emit(self, event: str, **attrs) -> None:
        if not self.enabled:
            return
        rec = {"event": event, "ts": time.time(), **attrs}
        try:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except OSError:
            pass
