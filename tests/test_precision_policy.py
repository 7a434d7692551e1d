"""Matmul precision policy (VERDICT r2 #1).

MATLAB `single` GEMM must run at true-f32 product precision by default —
JAX's TPU default multiplies f32 operands at bf16, losing ~13 mantissa
bits. The policy mirrors the reference's opt-in downcast guard
(runmat-accelerate/src/precision.rs:31-60): default 'highest', opt-in to
'high'/'bf16' via RUNMAT_TPU_MATMUL_PRECISION or
RUNMAT_TPU_ALLOW_PRECISION_DOWNCAST=1 or the accelerate.matmul_precision
config knob. On the CPU backend the precision argument is accepted and
products are always true f32, so these tests pin the *plumbing* (policy
resolution, cache keying, correctness); the bf16-vs-f32 numeric gap is
pinned on the real chip by bench.py's gemm parity check.
"""

import numpy as np

from runmat_tpu.accel import active_engine, init_engine, reset_engine, set_engine
from runmat_tpu.session import Session


def _fresh_engine(**kw):
    prev = active_engine()
    reset_engine()
    eng = init_engine(platform="cpu", **kw)
    return prev, eng


def test_default_policy_is_highest():
    prev, eng = _fresh_engine()
    try:
        assert eng.matmul_precision == "highest"
        from jax import lax
        assert eng.mm_precision() == lax.Precision.HIGHEST
    finally:
        set_engine(prev)


def test_env_optin_downcast(monkeypatch):
    monkeypatch.setenv("RUNMAT_TPU_ALLOW_PRECISION_DOWNCAST", "1")
    prev, eng = _fresh_engine()
    try:
        assert eng.matmul_precision == "bf16"
        from jax import lax
        assert eng.mm_precision() == lax.Precision.DEFAULT
    finally:
        set_engine(prev)


def test_env_explicit_precision(monkeypatch):
    monkeypatch.setenv("RUNMAT_TPU_MATMUL_PRECISION", "high")
    prev, eng = _fresh_engine()
    try:
        assert eng.matmul_precision == "high"
        from jax import lax
        assert eng.mm_precision() == lax.Precision.HIGH
    finally:
        set_engine(prev)


def test_ctor_knob_vs_env_precedence(monkeypatch):
    # env wins over the config/ctor value (config.py precedence contract)
    monkeypatch.setenv("RUNMAT_TPU_MATMUL_PRECISION", "bf16")
    prev, eng = _fresh_engine(matmul_precision="highest")
    try:
        assert eng.matmul_precision == "bf16"
    finally:
        set_engine(prev)
    # without the env var, the ctor/config value applies
    monkeypatch.delenv("RUNMAT_TPU_MATMUL_PRECISION")
    prev2, eng2 = _fresh_engine(matmul_precision="high")
    try:
        assert eng2.matmul_precision == "high"
    finally:
        set_engine(prev)


def test_precision_in_executable_cache_key():
    """Switching policy mid-session must not reuse the old executable."""
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("A = gpuArray(single(magic(8))); C = A*A; "
                     "g = gather(C);", "t")
        c1 = eng.stats["compiles"]
        eng.matmul_precision = "bf16"
        s.run_source("C2 = A*A; g2 = gather(C2);", "t")
        assert eng.stats["compiles"] > c1
        # same policy again: cache hit, no new compile
        c2 = eng.stats["compiles"]
        s.run_source("C3 = A*A; g3 = gather(C3);", "t")
        assert eng.stats["compiles"] == c2
    finally:
        set_engine(prev)


def test_single_gemm_matches_host_f32():
    """Device single GEMM == numpy f32 GEMM bit-for-bit tolerance on the
    CPU backend; on TPU in parity mode this same bound holds (bench.py
    enforces it on the real chip)."""
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("rng(7); A = single(rand(64)); B = single(rand(64)); "
                     "Cd = gather(gpuArray(A) * gpuArray(B)); Ch = A * B; "
                     "err = max(abs(Cd(:) - Ch(:)));", "t")
        assert float(np.asarray(s.get("err").host()).ravel()[0]) < 1e-4
    finally:
        set_engine(prev)


def test_pagemtimes_rides_policy():
    prev, eng = _fresh_engine()
    try:
        s = Session(accelerate=True)
        s.run_source("X = gpuArray(single(reshape(1:24, 2, 3, 4))); "
                     "Y = gpuArray(single(reshape(1:36, 3, 3, 4))); "
                     "Z = gather(pagemtimes(X, Y)); sz = size(Z);", "t")
        assert tuple(np.asarray(s.get("sz").host()).ravel()) == (2.0, 3.0, 4.0)
    finally:
        set_engine(prev)
