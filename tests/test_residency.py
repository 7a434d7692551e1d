"""HBM residency ledger + budget/pressure (≙ runmat-gc stats + wgpu buffer
residency pool, backend/wgpu/residency.rs; CLI `runmat gc stats`)."""

import gc

import numpy as np

from runmat_tpu.accel import active_engine, init_engine, reset_engine, set_engine
from runmat_tpu.session import Session


def _fresh_engine(**kw):
    prev = active_engine()
    reset_engine()
    eng = init_engine(platform="cpu", **kw)
    return prev, eng


def test_ledger_tracks_upload_and_free():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("x = gpuArray(ones(1000, 1)); y = gather(sum(x));", "t")
        rs = eng.residency.snapshot()
        assert rs["live_bytes"] >= 8000
        assert rs["n_live"] >= 1
        assert rs["allocs"] >= 1
        peak = rs["peak_bytes"]
        s.run_source("clear x", "t")
        del s
        gc.collect()
        rs2 = eng.residency.snapshot()
        assert rs2["live_bytes"] < rs["live_bytes"]
        assert rs2["frees"] >= 1
        assert rs2["peak_bytes"] == peak
    finally:
        set_engine(prev)


def test_scalar_nodes_not_tracked():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        before = eng.residency.snapshot()["allocs"]
        s.run_source("a = 1 + 2;", "t")   # pure host scalars
        assert eng.residency.snapshot()["allocs"] == before
    finally:
        set_engine(prev)


def test_budget_pressure_spills_workspace():
    prev, eng = _fresh_engine()
    try:
        eng.residency.budget_bytes = 200_000   # 200 KB budget
        s = Session(accelerate=True)
        from runmat_tpu.accel.residency import make_workspace_spiller
        eng.residency.pressure_hooks.append(make_workspace_spiller(s))
        # 3 x 80KB arrays exceed the budget; oldest should spill to host
        s.run_source("a = gpuArray(ones(10000,1)); b = gather(sum(a));", "t")
        s.run_source("c = gpuArray(2*ones(10000,1)); d = gather(sum(c));", "t")
        s.run_source("e = gpuArray(3*ones(10000,1)); f = gather(sum(e));", "t")
        gc.collect()
        assert eng.residency.pressure_events >= 1
        # a spilled variable is host-resident but semantically intact
        spilled = [n for n in ("a", "c", "e")
                   if not getattr(s.get(n), "on_device", True)]
        assert spilled, "at least one array must have spilled to host"
        nm = spilled[0]
        expect = {"a": 1.0, "c": 2.0, "e": 3.0}[nm]
        assert float(np.asarray(s.get(nm).host()).reshape(-1)[0]) == expect
        # and it still computes correctly after spilling (re-uploads)
        s.run_source(f"chk = gather(sum({nm} * 2));", "t")
        assert abs(float(s.get("chk").host()) - expect * 2 * 10000) < 1e-9
    finally:
        set_engine(prev)


def test_collect_drops_loop_arg_cache():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("z = gpuArray(ones(64,1)); "
                     "for k = 1:16, z = z + 1; end; w = gather(sum(z));", "t")
        res = eng.residency.collect(eng, full=False)
        assert res["kind"] == "minor"
        res2 = eng.residency.collect(eng, full=True)
        assert res2["kind"] == "major"
    finally:
        set_engine(prev)


def test_telemetry_snapshot_includes_residency():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("x = gpuArray(ones(100,1)); y = gather(sum(x));", "t")
        from runmat_tpu import telemetry
        snap = telemetry.snapshot(s)
        assert "residency" in snap
        assert snap["residency"]["live_bytes"] > 0
    finally:
        set_engine(prev)


def test_gc_cli_commands(capsys):
    from runmat_tpu import cli
    prev = active_engine()
    try:
        reset_engine()
        assert cli.main(["gc-stats"]) == 0
        out = capsys.readouterr().out
        assert "hbm ledger" in out
        assert cli.main(["gc-minor"]) == 0
        assert "minor collection" in capsys.readouterr().out
        assert cli.main(["gc-major"]) == 0
        assert "major collection" in capsys.readouterr().out
        assert cli.main(["gc-config"]) == 0
        assert "hbm budget" in capsys.readouterr().out
    finally:
        set_engine(prev)


def test_gpudevice_memory_fields():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("x = gpuArray(ones(10000, 1)); y = gather(sum(x)); "
                     "d = gpuDevice(); t = d.TotalMemory; "
                     "u = d.MemoryInUse; a = d.AvailableMemory;", "t")
        u = float(np.asarray(s.get("u").host()).reshape(-1)[0])
        assert u >= 80000   # the 80 KB array is in the ledger
    finally:
        set_engine(prev)


def test_pressure_spills_function_local_frames():
    """ADVICE r2: device arrays held in ACTIVE function frames participate
    in spilling, not just base-workspace variables."""
    prev, eng = _fresh_engine()
    try:
        eng.residency.budget_bytes = 200_000
        s = Session(accelerate=True)
        from runmat_tpu.accel.residency import make_workspace_spiller
        eng.residency.pressure_hooks.append(make_workspace_spiller(s))
        # The function allocates three device arrays locally (240 KB total,
        # over the 200 KB budget) while the base workspace holds none; the
        # pressure hook must find them through the live frame stack and the
        # function must still compute the right answer on spilled values.
        src = (
            "function r = burst()\n"
            "  u = gpuArray(ones(10000,1)); us = gather(sum(u));\n"
            "  v = gpuArray(2*ones(10000,1)); vs = gather(sum(v));\n"
            "  w = gpuArray(3*ones(10000,1)); ws = gather(sum(w));\n"
            "  r = gather(sum(u + v + w));\n"
            "end\n")
        s.run_source(src, "burst.m")
        s.run_source("out = burst();", "t")
        assert eng.residency.pressure_events >= 1
        assert s._spill_count >= 1
        assert abs(float(np.asarray(s.get("out").host()).reshape(-1)[0])
                   - 6.0 * 10000) < 1e-9
    finally:
        set_engine(prev)


def test_generational_accounting():
    """Ledger generations (≙ runmat-gc generations.rs): fresh handles count
    YOUNG; survivors past promote_after allocations count OLD; tenured
    deaths bump the promotion counter."""
    prev, eng = _fresh_engine()
    try:
        eng.residency.promote_after = 4
        s = Session(accelerate=True)
        s.run_source("keep = gpuArray(ones(500, 1)); "
                     "kk = gather(sum(keep));", "t")
        gs = eng.residency.generation_stats()
        assert gs["young_bytes"] > 0 and gs["old_bytes"] == 0
        # churn past the promotion horizon
        for k in range(6):
            s.run_source(f"tmp = gpuArray(ones(400, 1)) + {k}; "
                         "tt = gather(sum(tmp)); clear tmp", "t")
        gc.collect()
        gs2 = eng.residency.generation_stats()
        assert gs2["old_bytes"] > 0          # 'keep' tenured
        s.run_source("clear keep", "t")
        del s
        gc.collect()
        gs3 = eng.residency.generation_stats()
        assert gs3["promoted"] >= 1          # tenured handle died old
    finally:
        set_engine(prev)
