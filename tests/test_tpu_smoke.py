"""The on-chip conformance battery must pass CPU-pinned (same programs the
bench runs on the real TPU; a divergence there then isolates real
TPU-vs-CPU behavior, not a stale expectation)."""

from helpers import run
from runmat_tpu import tpu_smoke


def test_smoke_battery_all_pass_cpu():
    s = run("x = 1;", accelerate=True)
    res = tpu_smoke.run(s)
    assert res["failed"] == 0, res["failures"]
    assert res["passed"] >= 120, res["passed"]


class _Result:
    def __init__(self, error=None):
        self.error = error


class _FakeSession:
    """Scripted session keyed by case SOURCE: behavior is one of 'ok'
    (case passes), 'degraded' (raises a backend-loss-signature error, also
    on retry), or 'wrong' (plain failure). Retries re-execute the same
    source and get the same behavior."""

    def __init__(self, by_src):
        self.by_src = dict(by_src)

    def execute(self, src):
        mode = self.by_src.get(src, "ok")
        if mode == "degraded":
            return _Result(RuntimeError(
                "gpuArray: invalid input (JaxRuntimeError: UNIMPLEMENTED: "
                "TPU backend error (Unimplemented).)"))
        if mode == "wrong":
            return _Result(RuntimeError("assert failed: wrong answer"))
        return _Result(None)

    def get(self, var):
        raise KeyError(var)   # force per-check failure when consulted


def test_degradation_cascade_reclassifies_first_victim(monkeypatch):
    """Two consecutive backend-loss failures confirm a cascade: the FIRST
    victim (provisionally red) is retroactively reclassified as an
    environment skip, remaining cases skip, and the run is flagged
    environment_degraded — distinct from red (VERDICT r4 weak #3)."""
    cases = [("c0", "s0", ()),
             ("c1", "s1", (("v", 1.0, 0),)),
             ("c2", "s2", (("v", 1.0, 0),)),
             ("c3", "s3", ()), ("c4", "s4", ())]
    monkeypatch.setattr(tpu_smoke, "CASES", cases)
    sess = _FakeSession({"s1": "degraded", "s2": "degraded"})
    out = tpu_smoke.run(sess)
    assert out["environment_degraded"] is True
    assert out["failed"] == 0, out
    assert out["cases_skipped"] == 4          # c1 (reclassified), c2, c3, c4
    assert all("environment degraded" in f for f in out["failures"]), out


def test_degraded_retry_once_then_green(monkeypatch):
    """A single transient backend-loss error is retried and the battery
    stays green with no skips."""
    cases = [("c0", "s0", ()), ("c1", "s1", ()), ("c2", "s2", ())]
    monkeypatch.setattr(tpu_smoke, "CASES", cases)

    class _Flaky(_FakeSession):
        def __init__(self):
            super().__init__({})
            self.failed_once = False

        def execute(self, src):
            if not self.failed_once:
                self.failed_once = True
                return _Result(RuntimeError(
                    "JaxRuntimeError: UNAVAILABLE: Socket closed"))
            return super().execute(src)

    out = tpu_smoke.run(_Flaky())
    assert out["failed"] == 0 and "cases_skipped" not in out, out
    assert "environment_degraded" not in out


def test_isolated_degraded_failure_stays_red(monkeypatch):
    """One backend-loss failure followed by healthy cases is NOT a cascade:
    it stays red (could be a genuinely unsupported op), nothing skips."""
    cases = [("c0", "s0", (("v", 1.0, 0),)),
             ("c1", "s1", ()), ("c2", "s2", ())]
    monkeypatch.setattr(tpu_smoke, "CASES", cases)
    sess = _FakeSession({"s0": "degraded"})
    out = tpu_smoke.run(sess)
    assert out["failed"] == 1
    assert "environment_degraded" not in out
    assert "cases_skipped" not in out
