"""Device searchsorted-family ops: interp1/ismember/histcounts/moving
windows (≙ provider interpolation/sort-search/moving_window hooks)."""

import numpy as np

from helpers import run


def _err(s, name="err"):
    return float(np.asarray(s.get(name).host()).reshape(-1)[0])


def test_interp1_linear_device_parity():
    s = run("x = (0:100); v = sin(x/10); "
            "q = gpuArray(rand(1, 5000) * 100); "
            "r = interp1(x, v, q); ok = existsOnGPU(r); "
            "rh = gather(r); ref = interp1(x, v, gather(q)); "
            "err = max(abs(rh - ref));", accelerate=True)
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0])
    assert _err(s) < 1e-12


def test_interp1_device_nan_outside():
    s = run("x = (1:10); v = (1:10); q = gpuArray([0.5 5 11]); "
            "r = gather(interp1(x, v, q)); ", accelerate=True)
    r = s.get("r").host().reshape(-1)
    assert np.isnan(r[0]) and r[1] == 5.0 and np.isnan(r[2])


def test_ismember_device_parity():
    s = run("a = gpuArray(round(rand(1, 2000) * 100)); "
            "b = gpuArray([3 7 11 42 99]); "
            "tf = ismember(a, b); ok = existsOnGPU(tf); "
            "ref = ismember(gather(a), gather(b)); "
            "err = sum(abs(double(gather(tf)) - double(ref)));",
            accelerate=True)
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0])
    assert _err(s) == 0.0


def test_histcounts_device_parity():
    s = run("x = gpuArray(randn(1, 10000)); edges = -4:0.5:4; "
            "c = histcounts(x, edges); "
            "ref = histcounts(gather(x), edges); "
            "err = sum(abs(gather(c) - ref)); n = sum(gather(c));",
            accelerate=True)
    assert _err(s) == 0.0
    assert _err(s, "n") > 9000


def test_movmean_device_and_host_vectorized_parity():
    s = run("x = gpuArray(sin(0.05 * (1:5000))); "
            "m = movmean(x, 7); ok = existsOnGPU(m); "
            "ref = movmean(gather(x), 7); "
            "err = max(abs(gather(m) - ref));", accelerate=True)
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0])
    assert _err(s) < 1e-12


def test_mov_family_edge_semantics():
    # shrinking windows at the edges (MATLAB semantics)
    s = run("a = [1 2 3 4 5]; m3 = movmean(a, 3); s3 = movsum(a, 3); "
            "mx = movmax(a, 3); mn = movmin(a, 3); m4 = movmean(a, 4);")
    np.testing.assert_allclose(s.get("m3").host().reshape(-1),
                               [1.5, 2, 3, 4, 4.5])
    np.testing.assert_allclose(s.get("s3").host().reshape(-1),
                               [3, 6, 9, 12, 9])
    np.testing.assert_allclose(s.get("mx").host().reshape(-1),
                               [2, 3, 4, 5, 5])
    np.testing.assert_allclose(s.get("mn").host().reshape(-1),
                               [1, 1, 2, 3, 4])
    # even window: k/2 back, k/2-1 forward
    np.testing.assert_allclose(s.get("m4").host().reshape(-1),
                               [1.5, 2, 2.5, 3.5, 4])


def test_movmax_device_parity():
    s = run("x = gpuArray(randn(1, 3000)); "
            "m = movmax(x, 11); ref = movmax(gather(x), 11); "
            "err = max(abs(gather(m) - ref));", accelerate=True)
    assert _err(s) < 1e-12


def test_maxk_mink_device_parity():
    s = run("x = gpuArray(randn(1, 5000)); "
            "mx = maxk(x, 7); ok = existsOnGPU(mx); "
            "mn = mink(x, 5); "
            "rx = maxk(gather(x), 7); rn = mink(gather(x), 5); "
            "ex = max(abs(gather(mx) - rx)); en = max(abs(gather(mn) - rn));",
            accelerate=True)
    assert bool(np.asarray(s.get("ok").host()).reshape(-1)[0])
    assert _err(s, "ex") == 0.0 and _err(s, "en") == 0.0


def test_maxk_with_nans_device():
    s = run("x = gpuArray([3 nan 7 1 nan 9]); "
            "r = gather(maxk(x, 3));", accelerate=True)
    np.testing.assert_allclose(s.get("r").host().reshape(-1), [9, 7, 3])


def test_hilbert_envelope_device_parity():
    s = run("x = gpuArray(sin(0.02*(1:4096)) + 0.3*cos(0.11*(1:4096))); "
            "hgpu = gather(hilbert(x)); href = hilbert(gather(x)); "
            "eh = max(abs(hgpu - href)); "
            "egpu = gather(envelope(x)); eref = envelope(gather(x)); "
            "ee = max(abs(egpu - eref));", accelerate=True)
    assert _err(s, "eh") < 1e-9
    assert _err(s, "ee") < 1e-9


def test_spectrogram_device_parity():
    s = run("x = gpuArray(chirpish(1:8192)); "
            .replace("chirpish(1:8192)", "sin(0.001*(1:8192).^1.5)") +
            "[Sg, Fg, Tg] = spectrogram(x, 256, 128, 256); "
            "[Sr, Fr, Tr] = spectrogram(gather(x), 256, 128, 256); "
            "es = max(max(abs(Sg - Sr))); ef = max(abs(Fg - Fr)); "
            "et = max(abs(Tg - Tr));", accelerate=True)
    assert _err(s, "es") < 1e-8
    assert _err(s, "ef") == 0.0 and _err(s, "et") == 0.0


def test_pwelch_device_parity():
    s = run("x = gpuArray(sin(0.05*(1:8192)) + 0.1*sin(0.4*(1:8192))); "
            "[pg, wg] = pwelch(x, 256, 128, 512); "
            "[pr, wr] = pwelch(gather(x), 256, 128, 512); "
            "ep = max(abs(pg - pr)); ew = max(abs(wg - wr));",
            accelerate=True)
    assert _err(s, "ep") < 1e-10
    assert _err(s, "ew") == 0.0


# ------------------------------------------------------- device set ops

def test_unique_device_sorted_and_stable():
    s = run("A = gpuArray([3 1 2 3 1 5]); u = unique(A); "
            "us = unique(A, 'stable'); "
            "du = existsOnGPU(u); gu = gather(u); gs = gather(us);",
            accelerate=True)
    assert bool(np.asarray(s.get("du").host()).ravel()[0])
    np.testing.assert_allclose(s.get("gu").host().ravel(), [1, 2, 3, 5])
    np.testing.assert_allclose(s.get("gs").host().ravel(), [3, 1, 2, 5])


def test_unique_device_three_outputs():
    s = run("A = gpuArray([4 2 4 9 2]); [u, ia, ic] = unique(A); "
            "gu = gather(u); gia = gather(ia); gic = gather(ic);",
            accelerate=True)
    u = s.get("gu").host().ravel()
    ia = s.get("gia").host().ravel()
    ic = s.get("gic").host().ravel()
    np.testing.assert_allclose(u, [2, 4, 9])
    # C = A(ia), A = C(ic)
    A = np.array([4, 2, 4, 9, 2], float)
    np.testing.assert_allclose(A[(ia - 1).astype(int)], u)
    np.testing.assert_allclose(u[(ic - 1).astype(int)], A)


def test_unique_device_each_nan_distinct():
    s = run("A = gpuArray([1 NaN 2 NaN 1]); u = gather(unique(A));",
            accelerate=True)
    got = s.get("u").host().ravel()
    np.testing.assert_allclose(got, [1, 2, np.nan, np.nan], equal_nan=True)


def test_unique_device_orientation():
    s = run("r = gather(unique(gpuArray([3 1 2]))); "
            "c = gather(unique(gpuArray([3; 1; 2])));", accelerate=True)
    assert s.get("r").host().shape == (1, 3)
    assert s.get("c").host().shape == (3, 1)


def test_setdiff_union_intersect_device():
    s = run("A = gpuArray([5 1 3 3 7]); B = gpuArray([3 8 5]); "
            "d = gather(setdiff(A, B)); u = gather(union(A, B)); "
            "i = gather(intersect(A, B)); "
            "dd = existsOnGPU(setdiff(A, B));", accelerate=True)
    np.testing.assert_allclose(s.get("d").host().ravel(), [1, 7])
    np.testing.assert_allclose(s.get("u").host().ravel(), [1, 3, 5, 7, 8])
    np.testing.assert_allclose(s.get("i").host().ravel(), [3, 5])
    assert bool(np.asarray(s.get("dd").host()).ravel()[0])


def test_unique_device_no_data_roundtrip():
    """The device path must not gather the payload — only the 8-byte count
    (VERDICT r2 #5: gpuArray unique never round-trips)."""
    from runmat_tpu.accel import active_engine
    s = run("A = gpuArray(rand(1, 50000)); u = unique(A); "
            "ok = existsOnGPU(u);", accelerate=True)
    eng = active_engine()
    assert bool(np.asarray(s.get("ok").host()).ravel()[0])
    # payload gather would move 400 KB; the count sync moves a few bytes
    assert eng.stats["gather_bytes"] < 4096


def test_setxor_device_parity():
    s = run("A = gpuArray([5 1 3 3 7]); B = gpuArray([3 8 5]); "
            "x = gather(setxor(A, B)); d = existsOnGPU(setxor(A, B));",
            accelerate=True)
    np.testing.assert_allclose(s.get("x").host().ravel(), [1, 7, 8])
    assert bool(np.asarray(s.get("d").host()).ravel()[0])


def test_diff_trapz_mode_device_parity():
    s = run("v = gpuArray([1 4 9 16 25]); d1 = diff(v); d2 = diff(v, 2); "
            "M = gpuArray([1 5 3; 4 2 6]); dm = diff(M); dmc = diff(M, 1, 2); "
            "t = trapz(v); tx = trapz(gpuArray([0 1 2 4]), gpuArray([0 2 4 8])); "
            "m = mode(gpuArray([2 7 2 9 2 7])); "
            "ok = existsOnGPU(d1) && existsOnGPU(t);", accelerate=True)
    np.testing.assert_allclose(s.get("d1").host(), [[3, 5, 7, 9]])
    np.testing.assert_allclose(s.get("d2").host(), [[2, 2, 2]])
    np.testing.assert_allclose(s.get("dm").host(), [[3, -3, 3]])
    np.testing.assert_allclose(s.get("dmc").host(), [[4, -2], [-2, 4]])
    np.testing.assert_allclose(float(s.get("t").host().ravel()[0]), 42.0)
    np.testing.assert_allclose(float(s.get("tx").host().ravel()[0]), 16.0)
    np.testing.assert_allclose(float(s.get("m").host().ravel()[0]), 2.0)
    assert bool(np.asarray(s.get("ok").host()).ravel()[0])


def test_mode_device_nan_and_tie_rules():
    s = run("a = gather(mode(gpuArray([3 NaN 3 1 1]))); "
            "b = gather(mode(gpuArray([2 1 2 1])));", accelerate=True)
    # tie between 1 (x2) and 3 (x2): MATLAB picks the smallest -> 1
    assert float(s.get("a").host().ravel()[0]) == 1.0
    assert float(s.get("b").host().ravel()[0]) == 1.0


def test_accumarray_device_scatter():
    s = run("subs = [1; 3; 1; 2]; vals = gpuArray([10 20 30 40]'); "
            "r = accumarray(subs, vals); rs = accumarray(subs, vals, 5); "
            "ok = existsOnGPU(r);", accelerate=True)
    np.testing.assert_allclose(s.get("r").host().ravel(), [40, 40, 20])
    np.testing.assert_allclose(s.get("rs").host().ravel(),
                               [40, 40, 20, 0, 0])
    assert bool(np.asarray(s.get("ok").host()).ravel()[0])


def test_setxor_device_keeps_nan(): 
    """ADVICE r3: NaN never matches via broadcast ==, but each NaN is a
    distinct element of exactly one input, so MATLAB keeps it in the
    symmetric difference: setxor([NaN 1 2],[2 3]) == [1 3 NaN]."""
    s = run("A = gpuArray([NaN 1 2]); B = gpuArray([2 3]); "
            "x = gather(setxor(A, B)); "
            "y = gather(setxor(gpuArray([NaN]), gpuArray([NaN])));",
            accelerate=True)
    x = s.get("x").host().ravel()
    assert x.shape[0] == 3
    np.testing.assert_allclose(x[:2], [1, 3])
    assert np.isnan(x[2])
    y = s.get("y").host().ravel()
    assert y.shape[0] == 2 and np.isnan(y).all()
