"""gpuArray programming-model tests against the jax-CPU engine.

≙ the reference's with_test_provider fake-backend suites (SURVEY.md §4 item 4:
the in-process provider implements the full AccelProvider trait so residency /
gather / fusion semantics are tested with no GPU)."""

import numpy as np
import pytest

from helpers import run, scalar, out
from runmat_tpu.values import MatArray


def eng():
    from runmat_tpu.accel import active_engine
    return active_engine()


def test_upload_gather_roundtrip():
    s = run("g = gpuArray([1 2; 3 4]); h = gather(g);", accelerate=True)
    assert np.array_equal(s.get("h").host(), [[1, 2], [3, 4]])


def test_residency_propagates():
    s = run("g = gpuArray(single([1 2 3])); y = g .* 2 + 1;", accelerate=True)
    y = s.get("y")
    assert y.on_device
    assert y.mclass == "single"
    assert np.array_equal(y.host(), [[3, 5, 7]])


def test_exists_on_gpu():
    assert scalar("g = gpuArray(1); x = double(existsOnGPU(g));", accelerate=True) == 1.0
    assert scalar("x = double(existsOnGPU(5));", accelerate=True) == 0.0


def test_fusion_single_compile():
    before = dict(eng().stats) if eng() else None
    s = run("""
g = gpuArray(single(linspace(0, 1, 1000)));
y0 = sin(g) .* exp(-g / single(10));
y1 = y0 .* cos(g / 4) + single(0.25) .* (y0 .^ 2);
y2 = tanh(y1) + single(0.1) .* y1;
h = gather(y2);
""", accelerate=True)
    e = eng()
    # whole chain should materialize as ONE compiled computation
    assert e.stats["compiles"] - (before["compiles"] if before else 0) == 1
    h = s.get("h").host()
    # parity vs numpy
    g = np.linspace(0, 1, 1000, dtype=np.float64).astype(np.float32).reshape(1, -1)
    y0 = np.sin(g) * np.exp(-g / np.float32(10))
    y1 = y0 * np.cos(g / 4) + np.float32(0.25) * y0 ** 2
    y2 = np.tanh(y1) + np.float32(0.1) * y1
    assert np.allclose(h, y2, rtol=1e-6)


def test_jit_cache_hits_across_iterations():
    before = dict(eng().stats) if eng() else None
    s = run("""
g = gpuArray(single(ones(100, 1)));
for t = 1:5
  g = gpuArray(gather(g));
  g = g .* single(1.01) + single(0.5);
  h = gather(g);
end
""", accelerate=True)
    e = eng()
    # identical DAG structure every iteration -> one compile, then cache hits
    assert e.stats["compiles"] - (before["compiles"] if before else 0) == 1
    assert e.stats["cache_hits"] - (before["cache_hits"] if before else 0) >= 4


def test_device_reduction():
    assert scalar("g = gpuArray([1 2 3 4]); x = gather(sum(g));",
                  accelerate=True) == 10.0
    assert scalar("g = gpuArray([1 2; 3 4]); x = gather(mean(g, 'all'));",
                  accelerate=True) == 2.5


def test_reduction_dims_device():
    s = run("g = gpuArray(reshape(1:8, [2 2 2])); m = gather(mean(g, [2 3]));",
            accelerate=True)
    h = s.get("m").host()
    expect = np.mean(np.reshape(np.arange(1, 9), (2, 2, 2), order="F"),
                     axis=(1, 2), keepdims=True)
    assert np.allclose(h, expect.reshape(h.shape))


def test_device_matmul():
    s = run("a = gpuArray([1 2; 3 4]); b = gpuArray([5 6; 7 8]); c = gather(a * b);",
            accelerate=True)
    assert np.array_equal(s.get("c").host(), [[19, 22], [43, 50]])


def test_device_slice_read_stays_on_device():
    s = run("g = gpuArray([1 2 3; 4 5 6]); r = g(1, :); h = gather(r);",
            accelerate=True)
    assert np.array_equal(s.get("h").host(), [[1, 2, 3]])


def test_device_indexed_write():
    s = run("""
g = zeros(2, 3, 'like', gpuArray(single(0)));
g(1, :) = single([1 2 3]);
g(2, 2) = single(9);
h = gather(g);
""", accelerate=True)
    assert np.array_equal(s.get("h").host(), [[1, 2, 3], [0, 9, 0]])


def test_like_residency():
    s = run("proto = gpuArray(single(0)); z = ones(2, 2, 'like', proto);",
            accelerate=True)
    z = s.get("z")
    assert z.on_device and z.mclass == "single"


def test_gather_fallback_for_unsupported_ops():
    # sort has no device path yet -> transparent gather-and-host (≙ gather-retry)
    s = run("g = gpuArray([3 1 2]); h = sort(g);", accelerate=True)
    assert np.array_equal(s.get("h").host(), [[1, 2, 3]])


def test_gpu_device_info():
    o = out("d = gpuDevice(); disp(d.Platform)", accelerate=True)
    assert "cpu" in o


def test_single_class_preserved_on_device():
    s = run("g = gpuArray(single([1.5 2.5])); y = g + 1; h = gather(y);",
            accelerate=True)
    assert s.get("h").mclass == "single"
    assert s.get("h").host().dtype == np.float32


def test_mixed_host_device_binary():
    s = run("g = gpuArray([1 2 3]); h = [10 20 30]; y = gather(g + h);",
            accelerate=True)
    assert np.array_equal(s.get("y").host(), [[11, 22, 33]])


def test_arrayfun_host_roundtrip():
    s = run("x = arrayfun(@(v) v * 2, [1 2 3]);", accelerate=True)
    assert np.array_equal(s.get("x").host(), [[2, 4, 6]])
