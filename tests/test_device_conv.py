"""Device conv/filter paths (≙ provider conv1d/conv2d/iir_filter hooks,
api lib.rs:2535-2577): parity vs the host path at tight tolerance."""

import numpy as np

from helpers import run


def _pair(script_dev, script_host, var="r"):
    s = run(script_dev + " rd = gather(" + var + ");" +
            script_host.replace(var + " =", var + "h ="),
            accelerate=True)
    d = s.get("rd").host()
    h = s.get(var + "h").host()
    assert d.shape == h.shape, (d.shape, h.shape)
    np.testing.assert_allclose(np.asarray(d, float), np.asarray(h, float),
                               rtol=1e-6, atol=1e-9)


def test_conv_full_same_valid_device_parity():
    for mode in ("full", "same", "valid"):
        _pair(f"x = gpuArray(sin(1:200)); k = gpuArray([1 2 3 2 1]/9); "
              f"r = conv(x, k, '{mode}');",
              f"x = sin(1:200); k = [1 2 3 2 1]/9; "
              f"r = conv(x, k, '{mode}');")


def test_conv_column_orientation_device():
    s = run("x = gpuArray((1:50)'); k = gpuArray([1; 1; 1]); "
            "r = conv(x, k); sz = size(r);", accelerate=True)
    sz = s.get("sz").host().reshape(-1)
    assert sz[0] == 52 and sz[1] == 1


def test_conv2_modes_device_parity():
    for mode in ("full", "same", "valid"):
        _pair(f"A = gpuArray(magic(16)); K = gpuArray([1 0 -1; 2 0 -2; "
              f"1 0 -1]); r = conv2(A, K, '{mode}');",
              f"A = magic(16); K = [1 0 -1; 2 0 -2; 1 0 -1]; "
              f"r = conv2(A, K, '{mode}');")


def test_filter_fir_device_parity():
    _pair("x = gpuArray(cos(1:300)); b = [0.2 0.2 0.2 0.2 0.2]; "
          "r = filter(b, 1, x);",
          "x = cos(1:300); b = [0.2 0.2 0.2 0.2 0.2]; "
          "r = filter(b, 1, x);")


def test_filter_iir_device_parity():
    _pair("x = gpuArray(sin(0.1*(1:400))); "
          "r = filter([1 0.5], [1 -0.8 0.2], x);",
          "x = sin(0.1*(1:400)); "
          "r = filter([1 0.5], [1 -0.8 0.2], x);")


def test_filter_host_matches_scipy_with_zi():
    from scipy.signal import lfilter
    s = run("x = (1:50); b = [1 2]; a = [1 -0.5]; zi = 3; "
            "y = filter(b, a, x, zi);")
    y = s.get("y").host().reshape(-1)
    ref, _ = lfilter(np.array([1.0, 2]), np.array([1.0, -0.5]),
                     np.arange(1.0, 51), zi=np.array([3.0]))
    np.testing.assert_allclose(y, ref, rtol=1e-12)


def test_filtfilt_still_consistent():
    s = run("x = sin(0.2*(1:100)) + 0.1*cos(7*(1:100)); "
            "b = ones(1,5)/5; y = filtfilt(b, 1, x); n = numel(y);")
    assert float(np.asarray(s.get("n").host()).reshape(-1)[0]) == 100


def test_imfilter_device_parity():
    for opt in ("", ", 'replicate'"):
        s = run(f"A = gpuArray(magic(20)); K = fspecial('gaussian', 5, 1.2); "
                f"r = imfilter(A, K{opt}); rd = gather(r); "
                f"rh = imfilter(gather(A), K{opt});", accelerate=True)
        d = s.get("rd").host()
        h = s.get("rh").host()
        np.testing.assert_allclose(d, h, rtol=1e-10, atol=1e-10)


def test_filter_iir_actually_on_device():
    # regression: a 2-D z0 silently killed the lax.scan IIR trace and
    # memoized a permanent host fallback
    from runmat_tpu.accel import active_engine
    s = run("x = gpuArray(sin(0.1*(1:400))); "
            "r = filter([1 0.5], [1 -0.8 0.2], x); ok = existsOnGPU(r);",
            accelerate=True)
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0])
    eng = active_engine()
    assert not any(k[0] == "iir" for k in eng.dense._bad)
