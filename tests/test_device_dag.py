"""Device DAG breadth (VERDICT round-1 task 4): scans, sort, median/nnz,
arbitrary gather/scatter indexing, mask writes, lazy index_write.

Parity model: reference provider scan/sort/find/scatter/gather methods
(runmat-accelerate-api/src/lib.rs) exercised through the MATLAB surface on the
jax-CPU fake-provider path, asserting results AND residency (lazy writes must
not force a gather)."""

import numpy as np

from helpers import run, run_get

MAGIC4 = np.array([[16, 2, 3, 13], [5, 11, 10, 8],
                   [9, 7, 6, 12], [4, 14, 15, 1]], float)


def pair(body, names, setup_val="reshape(1:20, 4, 5)", tol=1e-12):
    h = run_get(f"A = {setup_val};" + body, *names)
    d = run_get(f"A = gpuArray({setup_val});" + body, *names, accelerate=True)
    for n in names:
        hv, dv = h[n].host(), d[n].host()
        assert hv.shape == dv.shape, f"{n}: {hv.shape} vs {dv.shape}"
        np.testing.assert_allclose(dv, hv, rtol=tol, atol=tol, err_msg=n,
                                   equal_nan=True)


# ---------------------------------------------------------------- scans

def test_cumsum_device_matches_host():
    pair("c1 = cumsum(A); c2 = cumsum(A, 2); c3 = cumsum(A, 'reverse');",
         ["c1", "c2", "c3"])


def test_cumsum_omitnan_device():
    pair("c = cumsum(A, 'omitnan'); p = cumprod(A, 'omitnan');",
         ["c", "p"], setup_val="[3 NaN 1 2]")


def test_cumsum_includenan_device():
    pair("c = cumsum(A);", ["c"], setup_val="[3 NaN 1 2]")


def test_cummax_cummin_nan_skip_device():
    pair("a = cummax(A); b = cummin(A);", ["a", "b"],
         setup_val="[NaN 3 NaN 1 5 2]")


def test_cumprod_matrix_device():
    pair("p = cumprod(A); p2 = cumprod(A, 2);", ["p", "p2"])


def test_scan_stays_resident():
    s = run("x = gpuArray(1:100); y = cumsum(x) + 1;", accelerate=True)
    assert s.get("y").on_device


# ---------------------------------------------------------------- sort

def test_sort_device_matches_host():
    pair("s1 = sort(A); s2 = sort(A, 2); s3 = sort(A, 'descend');",
         ["s1", "s2", "s3"])


def test_sort_device_indices():
    s = run("[v, i] = sort(gpuArray([3 1 2]));", accelerate=True)
    np.testing.assert_allclose(s.get("v").host(), [[1, 2, 3]])
    np.testing.assert_allclose(s.get("i").host(), [[2, 3, 1]])


def test_sort_device_nan_placement_both_directions():
    # MATLAB rule: NaN last ascending, NaN FIRST descending (NaN acts as
    # the largest value; ref sorting_sets/sort.rs compare_real_values).
    s = run("a = sort(gpuArray([3 NaN 1]), 'descend'); "
            "b = sort(gpuArray([3 NaN 1]));", accelerate=True)
    np.testing.assert_allclose(s.get("a").host(), [[np.nan, 3, 1]],
                               equal_nan=True)
    np.testing.assert_allclose(s.get("b").host(), [[1, 3, np.nan]],
                               equal_nan=True)


def test_sort_descend_nan_before_inf_and_stable_ties():
    # NaN sorts before Inf on descend; duplicate values keep original order
    # (stable) in both directions — indices prove it.
    s = run("[v, i] = sort(gpuArray([2 Inf NaN 2 5]), 'descend');",
            accelerate=True)
    np.testing.assert_allclose(s.get("v").host(), [[np.nan, np.inf, 5, 2, 2]],
                               equal_nan=True)
    np.testing.assert_allclose(s.get("i").host(), [[3, 2, 5, 1, 4]])


def test_median_nnz_device():
    pair("m = median(A); m2 = median(A, 2); n = nnz(A > 7);", ["m", "m2", "n"])


def test_median_omitnan_device():
    pair("m = median(A, 'omitnan');", ["m"], setup_val="[1 NaN 3 10]")


# ---------------------------------------------------------------- gather

def test_arbitrary_index_read_stays_device():
    s = run("A = gpuArray(reshape(1:20, 4, 5)); B = A([3 1], [5 2 4]); "
            "C = B + 0;", accelerate=True)
    assert s.get("C").on_device
    An = np.arange(1, 21).reshape(4, 5, order="F")
    np.testing.assert_allclose(s.get("B").host(),
                               An[np.ix_([2, 0], [4, 1, 3])])


def test_linear_gather_device():
    pair("b = A([1 6 20]); c = A([2; 3]); d = A(end);", ["b", "c", "d"])


def test_gather_orientation_device():
    pair("r = A(1, [3 1 2]); c = A([2 4], 3); v = A(:);", ["r", "c", "v"])


def test_out_of_range_read_errors_device():
    s = run("x = 0;", accelerate=True)
    r = s.execute("A = gpuArray(1:5); b = A(9);")
    assert r.error is not None


# ---------------------------------------------------------------- scatter

def test_slice_write_lazy_no_dispatch():
    """An indexed write must NOT dispatch eagerly (VERDICT: index_write
    breaks fusion)."""
    from runmat_tpu.accel import active_engine
    s = run("A = gpuArray(reshape(1:20, 4, 5));", accelerate=True)
    eng = active_engine()
    base = eng.stats["dispatches"]
    r = s.execute("A(2, :) = 0; A(1, 2) = 99;")
    assert r.error is None
    assert eng.stats["dispatches"] == base   # still lazy
    An = np.arange(1, 21).reshape(4, 5, order="F").astype(float)
    An[1, :] = 0
    An[0, 1] = 99
    np.testing.assert_allclose(s.get("A").host(), An)


def test_arbitrary_scatter_device():
    pair("A([1 3], [2 4]) = [100 200; 300 400]; A([1 5]) = -1;", ["A"])


def test_mask_write_scalar_device():
    s = run("M = gpuArray(magic(4)); M(M > 10) = 0; t = sum(M(:));",
            accelerate=True)
    Mn = MAGIC4.copy()
    Mn[Mn > 10] = 0
    np.testing.assert_allclose(s.get("M").host(), Mn)


def test_colon_fill_device():
    pair("A(:) = 7;", ["A"])
    pair("A(:) = 1:20;", ["A"])


def test_duplicate_index_write_last_wins():
    # duplicates must fall back to host (XLA scatter order is unspecified)
    pair("A([2 2]) = [10 20];", ["A"], setup_val="1:5")


def test_write_preserves_cow():
    """B = A; A(1) = 99 must not change B (value semantics on device)."""
    s = run("A = gpuArray(1:5); B = A; A(1) = 99;", accelerate=True)
    np.testing.assert_allclose(s.get("B").host(), [[1, 2, 3, 4, 5]])
    np.testing.assert_allclose(s.get("A").host(), [[99, 2, 3, 4, 5]])


def test_write_then_read_chain_fuses():
    s = run("x = gpuArray(zeros(1, 8)); x(3:6) = 5; y = sin(x) + 1; "
            "t = sum(y);", accelerate=True)
    xn = np.zeros((1, 8))
    xn[0, 2:6] = 5
    np.testing.assert_allclose(s.get("t").host(),
                               np.sum(np.sin(xn) + 1), rtol=1e-12)


def test_growth_falls_back_to_host():
    s = run("A = gpuArray(1:3); A(5) = 9;", accelerate=True)
    np.testing.assert_allclose(s.get("A").host(), [[1, 2, 3, 0, 9]])


# ---------------------------------------------------------------- find

def test_find_device():
    pair("f = find(A > 10); [r, c] = find(A == 15);", ["f", "r", "c"])


def test_find_first_n_device():
    s = run("f = find(gpuArray([0 5 0 7 0 9]), 2);", accelerate=True)
    np.testing.assert_allclose(s.get("f").host(), [[2, 4]])


# ------------------------------------------------- loop gate indexed access

def _loop_dispatches(setup, loop):
    from runmat_tpu.accel import active_engine
    s = run(setup, accelerate=True)
    eng = active_engine()
    c0 = eng.stats["dispatches"]
    r = s.execute(loop)
    assert r.error is None
    return s, eng.stats["dispatches"] - c0


def test_loop_column_write_single_dispatch():
    """S(:,t) = f(X(:,t)) loops compile to ONE lax.fori_loop dispatch
    (VERDICT task 4 done-criterion)."""
    s, n = _loop_dispatches(
        "X = gpuArray(reshape(1:80, 8, 10)); Z = gpuArray((1:10)*0.5); "
        "S = gpuArray(zeros(8, 10));",
        "for t = 1:10, S(:, t) = X(:, t) .* 2 + Z(t); end")
    assert n == 1
    Xn = np.arange(1, 81).reshape(8, 10, order="F").astype(float)
    Sn = Xn * 2 + (np.arange(1, 11) * 0.5)[None, :]
    np.testing.assert_allclose(s.get("S").host(), Sn)


def test_loop_mask_write_stays_on_device():
    s, n = _loop_dispatches(
        "M = gpuArray(magic(4)); A = gpuArray(ones(4));",
        "for t = 1:8, A = A + 1; A(M > 10) = 0; end")
    assert n == 1
    An = np.ones((4, 4))
    for _ in range(8):
        An += 1
        An[MAGIC4 > 10] = 0
    np.testing.assert_allclose(s.get("A").host(), An)


def test_loop_linear_dyn_write():
    s, n = _loop_dispatches("v = gpuArray(zeros(1, 12));",
                            "for t = 1:12, v(t) = t * 2; end")
    assert n == 1
    np.testing.assert_allclose(s.get("v").host(),
                               (np.arange(1, 13) * 2).reshape(1, -1))


def test_loop_dyn_read_accumulate():
    s, n = _loop_dispatches(
        "X = gpuArray(reshape(1:40, 4, 10)); acc = gpuArray(zeros(4, 1));",
        "for t = 1:10, acc = acc + X(:, t); end")
    assert n == 1
    Xn = np.arange(1, 41).reshape(4, 10, order="F").astype(float)
    np.testing.assert_allclose(s.get("acc").host(), Xn.sum(1, keepdims=True))


def test_loop_end_subscript_and_static_index():
    s, n = _loop_dispatches(
        "S = gpuArray(zeros(1, 8)); w = gpuArray(0);",
        "for t = 1:8, S(t) = t; w = w + S(end) + S(1); end")
    np.testing.assert_allclose(s.get("S").host(),
                               np.arange(1, 9).reshape(1, -1))
    # S(end) inside the loop reads slot 8 (static extent), matching MATLAB
    Sn = np.zeros(8)
    w = 0.0
    for t in range(1, 9):
        Sn[t - 1] = t
        w += Sn[7] + Sn[0]
    np.testing.assert_allclose(s.get("w").host().ravel()[0], w)


def test_loop_out_of_range_loopvar_falls_back():
    # loop variable exceeds the array extent: gate must bail, host grows
    s, n = _loop_dispatches("v = gpuArray(zeros(1, 3));",
                            "for t = 1:5, v(t) = t; end")
    np.testing.assert_allclose(s.get("v").host(),
                               np.arange(1, 6).reshape(1, -1))


# ---------------------------------------------------------------- telemetry

def test_telemetry_categories_memory_launches():
    """accel-info --json surface: per-category dispatch stats, HBM accounting
    fields, bounded kernel-launch log (≙ ProviderTelemetry,
    runmat-accelerate-api/src/lib.rs:1337-1376)."""
    from runmat_tpu import telemetry
    s = run("x = gpuArray(rand(64)); y = x * x; g = gather(sum(sin(y(:))));",
            accelerate=True)
    snap = telemetry.snapshot(s)
    assert "matmul" in snap["categories"]
    assert snap["categories"]["matmul"]["dispatches"] >= 1
    mem = snap["memory"]
    assert set(mem) >= {"available", "bytes_in_use", "bytes_limit", "devices"}
    assert snap["launches"] and "ops" in snap["launches"][0]
    assert "out_bytes" in snap["launches"][0]


# --------------------------------------------- structural ops stay resident

def test_structural_ops_stay_resident_with_parity():
    """flip/circshift/repmat/rot90/permute/tril/triu/kron on gpuArrays join
    the lazy DAG (no gather) and match numpy oracles."""
    s = run("A = gpuArray(reshape(1:12, 3, 4)); "
            "f1 = flip(A); f2 = fliplr(A); f3 = flipud(A); "
            "c1 = circshift(A, 1); c2 = circshift(A, 2, 2); "
            "r = repmat(A, 2, 1); t = rot90(A); tm = rot90(A, 2); "
            "k = kron(A, gpuArray(ones(2))); p = permute(A, [2 1]); "
            "tl = tril(A); tu = triu(A, 1); "
            "q = squeeze(gpuArray(reshape(1:8, 1, 2, 4)));",
            accelerate=True)
    ref = np.arange(1, 13).reshape(3, 4, order="F").astype(float)
    checks = {
        "f1": np.flip(ref, 0), "f2": np.flip(ref, 1), "f3": np.flip(ref, 0),
        "c1": np.roll(ref, 1, 0), "c2": np.roll(ref, 2, 1),
        "r": np.tile(ref, (2, 1)), "t": np.rot90(ref),
        "tm": np.rot90(ref, 2),
        "k": np.kron(ref, np.ones((2, 2))), "p": ref.T,
        "tl": np.tril(ref), "tu": np.triu(ref, 1),
    }
    for name, want in checks.items():
        v = s.get(name)
        assert v.on_device, name
        np.testing.assert_allclose(np.asarray(v.host(), float), want,
                                   err_msg=name)
    q = s.get("q")
    assert q.on_device and q.host().shape == (2, 4)
    np.testing.assert_allclose(
        q.host(), np.arange(1, 9).reshape(2, 4, order="F"))


def test_structural_ops_fuse_with_elementwise():
    """A structural op's output fuses into downstream elementwise math —
    one materialization, still exact."""
    s = run("A = gpuArray(reshape(1:6, 2, 3)); "
            "y = sum(flipud(A) .* 2 + 1, 'all'); g = gather(y);",
            accelerate=True)
    ref = np.arange(1, 7).reshape(2, 3, order="F")
    want = float((np.flip(ref, 0) * 2 + 1).sum())
    assert float(np.asarray(s.get("g").host()).ravel()[0]) == want
