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
