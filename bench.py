#!/usr/bin/env python
"""Benchmark driver: reference workloads + roofline measurement on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Two benchmark families (BASELINE.json metric line):
  1. The three reference workloads (wall-clock vs the reference's published ms,
     BASELINE.md) -> geomean speedup = the headline value.
  2. Roofline: fused-elementwise HBM GB/s (target >=80% of peak) and chained
     8k single-precision matmul TFLOP/s (target >=50% of MXU peak). Both run
     as MATLAB `for` loops that the device loop gate folds into one
     lax.fori_loop dispatch, so the tunnel round trip (~30 ms on this
     remote-attached chip) amortizes over many passes; the measured
     empty-dispatch round trip is subtracted before computing rates.

vs_baseline = geometric-mean speedup (reference_ms / our_ms, >1 means faster).
Per-workload details go to stderr.
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

# per-chip peaks for roofline denominators
PEAKS = {
    # device_kind substring -> (HBM GB/s, MXU dense TFLOP/s bf16)
    "v5 lite": (819.0, 197.0),
    "v5e": (819.0, 197.0),
    "v4": (1228.0, 275.0),
    "v5p": (2765.0, 459.0),
    "v6": (1640.0, 918.0),
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _peaks(eng) -> tuple:
    kind = str(eng.device_info().get("name", "")).lower()
    for key, v in PEAKS.items():
        if key in kind:
            return v
    return (819.0, 197.0)  # default to v5e-class


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


# --------------------------------------------------------------------------- #
# roofline cases
# --------------------------------------------------------------------------- #

def _timed_loop(sess, eng, setup: str, loop_src: str, force_var: str,
                reps: int) -> float:
    """Median wall ms of running `loop_src` + blocking on force_var."""
    sess.run_source(setup, "roofline_setup")
    if eng is not None:
        eng.block_until_ready(sess.get(force_var))

    def once() -> float:
        t0 = time.perf_counter()
        sess.run_source(loop_src, "roofline_loop")
        v = sess.get(force_var)
        if v is not None and getattr(v, "on_device", False):
            eng.block_until_ready(v)
        return (time.perf_counter() - t0) * 1000.0

    warm = once()   # compile
    times = [once() for _ in range(max(reps, 3))]
    med = statistics.median(times)
    log(f"    warmup {warm:.1f} ms, median {med:.2f} ms "
        f"(min {min(times):.2f}, max {max(times):.2f})")
    return med


def run_roofline(sess) -> dict:
    """Roofline accounting: each workload is a MATLAB `for` loop folded into
    ONE lax.fori_loop dispatch. Fixed overhead (parse + loop-gate trace +
    tunnel round trips) is measured by running the SAME loop over tiny data
    (zero device work) and subtracted — more accurate than a bare round-trip
    probe because it includes the per-call host-side costs."""
    from runmat_tpu.accel import active_engine
    eng = active_engine()
    if eng is None:
        return {}
    hbm_peak, mxu_peak = _peaks(eng)
    out: dict = {}

    # ---- fused elementwise HBM roofline: K passes of a STREAM triad over N
    # floats (y += x .* c). Each fori_loop iteration reads x and y and writes
    # y (carry is donated), so traffic = K * 3 * 4N bytes in one dispatch
    # (accel/loops.py). Triad keeps more loads in flight than a copy-scale
    # and measures ~3% closer to the physical HBM peak.
    N = int(os.environ.get("BENCH_EW_N", 100_000_000))
    K = int(os.environ.get("BENCH_EW_K", 256))
    log(f"  elementwise roofline: N={N}, K={K}")

    def ew_loop(k):
        return (f"for bench_k = 1:{k}, "
                f"ew_y = ew_y + ew_x .* single(1.0001); end")

    ctl = _timed_loop(sess, eng, "ew_x = gpuArray(rand(16, 1, 'single')); "
                      "ew_y = gpuArray(rand(16, 1, 'single'));",
                      ew_loop(K), "ew_y", REPS)
    ms = _timed_loop(sess, eng, f"ew_x = gpuArray(rand({N}, 1, 'single')); "
                     f"ew_y = gpuArray(rand({N}, 1, 'single'));",
                     ew_loop(K), "ew_y", REPS)
    out["overhead_ms"] = round(ctl, 2)
    dev_ms = max(ms - ctl, 1e-3)
    gbytes = K * 3 * 4 * N / 1e9
    gbps = gbytes / (dev_ms / 1e3)
    out["elementwise_gbps"] = round(gbps, 1)
    out["elementwise_pct_hbm"] = round(100.0 * gbps / hbm_peak, 1)
    log(f"  elementwise: {gbps:.0f} GB/s = {out['elementwise_pct_hbm']:.1f}% "
        f"of {hbm_peak:.0f} GB/s peak (overhead control {ctl:.1f} ms)")
    sess.run_source("clear ew_x ew_y", "roofline_clear")

    # ---- matmul MXU roofline: K chained NxN single matmuls in one fori_loop
    # dispatch. sc = 1/2048 keeps magnitudes stable (exact in f32).
    # Measured in BOTH precision modes (VERDICT r2 #1): the parity default
    # ('highest' = true-f32 multi-pass products, denominator = the f32 peak)
    # and the opt-in 'bf16' downcast (denominator = the bf16 MXU peak). The
    # headline matmul_pct_mxu is the PARITY mode — the number a MATLAB
    # `single` workload actually gets by default.
    Nm = int(os.environ.get("BENCH_MM_N", 8192))
    Km = int(os.environ.get("BENCH_MM_K", 16))
    log(f"  matmul roofline: N={Nm}, K={Km}")

    def mm_loop(k):
        return (f"for bench_k = 1:{k}, "
                f"mm_C = mm_C * mm_B .* single(1/2048); end")

    def measure_mm() -> float:
        # extra reps: the tunnel adds occasional ~100 ms outliers and the
        # MXU% headline should be stable round-to-round (median of 7)
        reps = max(REPS, 7)
        ctl = _timed_loop(
            sess, eng, "mm_B = gpuArray(rand(16, 16, 'single')); "
            "mm_C = gpuArray(rand(16, 16, 'single'));", mm_loop(Km), "mm_C",
            reps)
        ms = _timed_loop(
            sess, eng, f"mm_B = gpuArray(rand({Nm}, {Nm}, 'single')); "
            f"mm_C = gpuArray(rand({Nm}, {Nm}, 'single'));", mm_loop(Km),
            "mm_C", reps)
        dev_ms = max(ms - ctl, 1e-3)
        flops = Km * 2.0 * (Nm ** 3)
        return flops / (dev_ms / 1e3) / 1e12

    # f32-equivalent product peak: HIGHEST lowers to 6 bf16 passes on the
    # MXU (HIGH would be 3); the achievable f32 ceiling is peak/6.
    policy = eng.matmul_precision
    f32_div = {"highest": 6.0, "high": 3.0}.get(policy, 1.0)
    f32_peak = mxu_peak / f32_div
    tflops = measure_mm()
    out["matmul_precision"] = policy
    out["matmul_tflops"] = round(tflops, 1)
    out["matmul_pct_mxu"] = round(100.0 * tflops / f32_peak, 1)
    log(f"  matmul[{policy}]: {tflops:.1f} TFLOP/s = "
        f"{out['matmul_pct_mxu']:.1f}% of {f32_peak:.0f} TFLOP/s "
        f"f32-equivalent peak (bf16 peak {mxu_peak:.0f} / {f32_div:.0f})")

    if os.environ.get("BENCH_SKIP_BF16") != "1" and policy != "bf16":
        prev_policy = eng.matmul_precision
        try:
            eng.matmul_precision = "bf16"
            tflops_bf16 = measure_mm()
            out["matmul_tflops_bf16"] = round(tflops_bf16, 1)
            out["matmul_pct_mxu_bf16"] = round(
                100.0 * tflops_bf16 / mxu_peak, 1)
            log(f"  matmul[bf16 opt-in]: {tflops_bf16:.1f} TFLOP/s = "
                f"{out['matmul_pct_mxu_bf16']:.1f}% of {mxu_peak:.0f} "
                f"TFLOP/s bf16 MXU peak")
        finally:
            eng.matmul_precision = prev_policy
    sess.run_source("clear mm_B mm_C", "roofline_clear")
    return out


def gemm_parity_check(sess) -> dict:
    """Pin the precision policy on the real chip: device `single` GEMM under
    the parity default must match a host numpy f32 GEMM to f32 rounding
    (maxrel ~1e-6); the bf16 downcast path would show ~1e-3 and fail."""
    import numpy as np
    sess.run_source(
        "rng(42); pp_A = single(rand(512)); pp_B = single(rand(512)); "
        "pp_C = gather(gpuArray(pp_A) * gpuArray(pp_B));", "gemm_parity")
    A = np.asarray(sess.get("pp_A").host(), dtype=np.float32)
    B = np.asarray(sess.get("pp_B").host(), dtype=np.float32)
    C = np.asarray(sess.get("pp_C").host(), dtype=np.float64)
    ref = (A @ B).astype(np.float64)
    maxrel = float(np.max(np.abs(C - ref)) / np.max(np.abs(ref)))
    ok = maxrel < 1e-4
    log(f"  gemm parity (single, default policy): maxrel {maxrel:.2e} "
        f"{'OK' if ok else 'FAIL — bf16-class truncation detected'}")
    sess.run_source("clear pp_A pp_B pp_C", "gemm_parity_clear")
    return {"gemm_parity_maxrel": maxrel, "gemm_parity_ok": ok}


def main() -> int:
    # Real accelerator: do NOT pin platform (tests pin cpu via env; clear it).
    os.environ.pop("RUNMAT_TPU_PLATFORM", None)
    from runmat_tpu.session import Session
    from runmat_tpu.accel import active_engine

    sess = Session(accelerate=True)
    eng = active_engine()
    info = eng.device_info() if eng else {"platform": "host", "name": "numpy"}
    log(f"bench on {info['platform']} ({info['name']})")

    # Warmup-manifest replay FIRST (VERDICT r2 #2): AOT-compile the committed
    # bench manifest + the user manifest into the persistent XLA cache so the
    # per-workload warmups below are cache hits. With a hot disk cache this
    # is seconds; on a genuinely cold cache it pays the tunnel compiles here,
    # attributed to warmup_replay_s, under a wall budget.
    warmup_replay_s = 0.0
    if eng is not None and os.environ.get("BENCH_SKIP_WARMUP") != "1":
        from runmat_tpu.accel import warmup as _wu
        budget = float(os.environ.get("BENCH_WARMUP_BUDGET", "600"))
        t0 = time.perf_counter()
        n = 0
        try:
            # committed bench manifest FIRST (it covers exactly this suite);
            # the general user manifest takes whatever budget remains
            bundled = _wu.bundled_manifest_path()
            if bundled:
                n += _wu.replay(eng, path=bundled, budget_s=budget)
            left = max(0.0, budget - (time.perf_counter() - t0))
            if left > 0:
                n += _wu.replay(eng, budget_s=left)
        except Exception as e:
            log(f"  warmup replay failed: {type(e).__name__}: {e}")
        warmup_replay_s = time.perf_counter() - t0
        log(f"warmup replay: {n} programs in {warmup_replay_s:.1f}s")

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

    roofline = {}
    if os.environ.get("BENCH_SKIP_ROOFLINE") != "1":
        log("roofline:")
        try:
            roofline = run_roofline(sess)
        except Exception as e:  # roofline must never sink the suite result
            log(f"  roofline failed: {type(e).__name__}: {e}")
        try:
            roofline.update(gemm_parity_check(sess))
        except Exception as e:
            log(f"  gemm parity check failed: {type(e).__name__}: {e}")

    print(json.dumps({
        "metric": "benchmark_suite_geomean_speedup_vs_runmat",
        "value": round(geo, 4),
        "unit": "x (reference_ms / our_ms, geomean of elementwise-math 10M, "
                "monte-carlo 1M/T256, 4k-image B=16)",
        "vs_baseline": round(geo, 4),
        "detail_ms": {k: round(v, 2) for k, v in results.items()},
        "warmup_replay_s": round(warmup_replay_s, 1),
        "roofline": roofline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
