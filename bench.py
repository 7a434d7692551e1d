#!/usr/bin/env python
"""Benchmark driver: runs the three reference workloads on the real TPU and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baselines (BASELINE.md — reference RunMat wall-clock on its wgpu GPU):
  elementwise-math 10M pts : 143.39 ms
  monte-carlo 1M paths T256: 188.00 ms
  4k-image B=16            : 241.56 ms

vs_baseline = geometric-mean speedup (reference_ms / our_ms, >1 means faster
than the reference). Per-workload details go to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


BASELINES_MS = {
    "elementwise_math": 143.39,
    "monte_carlo": 188.00,
    "image_normalize": 241.56,
}

REPS = int(os.environ.get("BENCH_REPS", "5"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_case(sess, name: str, force_vars: list[str]) -> float:
    import pathlib
    src = (pathlib.Path(__file__).parent / "benchmarks" / f"{name}.m").read_text()
    from runmat_tpu.accel import active_engine
    eng = active_engine()

    def once() -> float:
        t0 = time.perf_counter()
        sess.run_source(src, name)
        # Every script ends in a host-gathered checksum. Skipping the final
        # block is only sound when the engine PROVES the variable's dispatch
        # completed: dispatches finish in stream order, so dispatch_id <=
        # gathered_seq (the highest id a blocking gather has waited past)
        # means done. Anything else pays the sync — a ~30 ms tunnel round
        # trip is cheaper than a wrong benchmark (ADVICE round 1).
        if eng is not None:
            for v in force_vars:
                val = sess.get(v)
                if val is not None and getattr(val, "on_device", False):
                    node = val.dev
                    did = getattr(node, "dispatch_id", None)
                    if node.value is not None and did is not None \
                            and did <= eng.gathered_seq:
                        continue
                    eng.block_until_ready(val)
        return (time.perf_counter() - t0) * 1000.0

    warm = once()
    log(f"  {name}: warmup {warm:.1f} ms")
    times = [once() for _ in range(REPS)]
    med = statistics.median(times)
    log(f"  {name}: median {med:.2f} ms over {REPS} reps "
        f"(min {min(times):.2f}, max {max(times):.2f})")
    return med


def main() -> int:
    # Real accelerator: do NOT pin platform (tests pin cpu via env; clear it).
    os.environ.pop("RUNMAT_TPU_PLATFORM", None)
    from runmat_tpu.session import Session
    from runmat_tpu.accel import active_engine

    sess = Session(accelerate=True)
    eng = active_engine()
    info = eng.device_info() if eng else {"platform": "host", "name": "numpy"}
    log(f"bench on {info['platform']} ({info['name']})")

    results = {}
    results["elementwise_math"] = run_case(sess, "elementwise_math", ["y2"])
    results["monte_carlo"] = run_case(sess, "monte_carlo", ["S"])
    results["image_normalize"] = run_case(sess, "image_normalize", ["out"])

    speedups = []
    for k, ms in results.items():
        sp = BASELINES_MS[k] / ms
        speedups.append(sp)
        log(f"  {k}: {ms:.2f} ms  (reference {BASELINES_MS[k]:.2f} ms, "
            f"speedup {sp:.2f}x)")
    geo = 1.0
    for s in speedups:
        geo *= s
    geo **= 1.0 / len(speedups)

    print(json.dumps({
        "metric": "benchmark_suite_geomean_speedup_vs_runmat",
        "value": round(geo, 4),
        "unit": "x (reference_ms / our_ms, geomean of elementwise-math 10M, "
                "monte-carlo 1M/T256, 4k-image B=16)",
        "vs_baseline": round(geo, 4),
        "detail_ms": {k: round(v, 2) for k, v in results.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
