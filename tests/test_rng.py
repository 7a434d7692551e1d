"""Philox RNG tests: determinism, host/device stream parity, state contract.

≙ reference GPU RNG tests (backend/wgpu/provider/ops/random.rs — shared Philox
state advanced per chunk, gather parity)."""

import numpy as np
import pytest

from helpers import run, scalar
from runmat_tpu.ops import ctrng as philox


def test_determinism_across_sessions():
    a = run("rng(42); x = rand(1, 5);").get("x").host()
    b = run("rng(42); x = rand(1, 5);").get("x").host()
    assert np.array_equal(a, b)


def test_different_seeds_differ():
    a = run("rng(1); x = rand(1, 5);").get("x").host()
    b = run("rng(2); x = rand(1, 5);").get("x").host()
    assert not np.array_equal(a, b)


def test_stream_advances():
    s = run("rng(0); a = rand(1, 3); b = rand(1, 3);")
    assert not np.array_equal(s.get("a").host(), s.get("b").host())


def test_rng_default():
    a = run("rng(0); x = rand(2, 2);").get("x").host()
    b = run("rng('default'); x = rand(2, 2);").get("x").host()
    assert np.array_equal(a, b)


def test_uniform_range():
    h = run("rng(7); x = rand(1, 10000);").get("x").host()
    assert h.min() >= 0.0 and h.max() < 1.0
    assert abs(h.mean() - 0.5) < 0.02


def test_randn_moments():
    h = run("rng(7); x = randn(1, 100000);").get("x").host()
    assert abs(h.mean()) < 0.02
    assert abs(h.std() - 1.0) < 0.02


def test_single_precision():
    s = run("rng(0); x = rand(3, 3, 'single');")
    assert s.get("x").mclass == "single"
    assert s.get("x").host().dtype == np.float32


def test_randi_range():
    h = run("rng(3); x = randi(10, 1, 1000);").get("x").host()
    assert h.min() >= 1 and h.max() <= 10
    assert h.dtype == np.float64
    assert np.all(h == np.floor(h))


def test_randperm():
    h = run("rng(5); x = randperm(10);").get("x").host()
    assert sorted(h.reshape(-1).tolist()) == list(range(1, 11))


def test_host_device_stream_parity():
    """The same (seed, draw sequence) must line up whether a draw runs on host
    numpy or on the jax engine — the reference's gather parity for Philox
    chunks. Contract (ops/philox.py): uniforms bit-exact; normals consume the
    identical stream but agree only to ULPs (backend libm differs); a second
    draw after a cross-backend draw stays in sync (state advance identical)."""
    host = run("rng(123); a = rand(4, 4, 'single'); b = randn(4, 4, 'single');"
               "c = rand(4, 4);",
               accelerate=False)
    ah, bh, ch = host.get("a").host(), host.get("b").host(), host.get("c").host()
    import os
    os.environ["RUNMAT_TPU_OFFLOAD_THRESHOLD"] = "4"
    os.environ["RUNMAT_TPU_AUTO_OFFLOAD"] = "1"
    try:
        dev = run("rng(123); a = rand(4, 4, 'single'); b = randn(4, 4, 'single');"
                  "c = rand(4, 4);",
                  accelerate=True)
        ad, bd, cd = dev.get("a").host(), dev.get("b").host(), dev.get("c").host()
    finally:
        del os.environ["RUNMAT_TPU_OFFLOAD_THRESHOLD"]
        del os.environ["RUNMAT_TPU_AUTO_OFFLOAD"]
    assert np.array_equal(ah, ad)                      # uniforms: bit-exact
    np.testing.assert_allclose(bh, bd, rtol=1e-5)      # normals: ULP-level
    assert np.array_equal(ch, cd)                      # stream stayed in sync


def test_philox_jnp_np_bit_identical():
    import jax.numpy as jnp
    key = (0x12345678, 0x9ABCDEF0)
    vn, _ = philox.uniform_u32(np, key, 1000, 64)
    vj, _ = philox.uniform_u32(jnp, key, 1000, 64)
    assert np.array_equal(vn, np.asarray(vj))


def test_rng_state_save_restore():
    s = run("""
rng(9);
a1 = rand(1, 3);
st = rng;
b1 = rand(1, 3);
rng(st);
b2 = rand(1, 3);
""")
    assert np.array_equal(s.get("b1").host(), s.get("b2").host())
