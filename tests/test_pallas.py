"""Pallas TPU kernels, validated in interpreter mode on the CPU mesh
(bit-parity against the portable ctrng stream)."""

import numpy as np

from runmat_tpu.ops import ctrng
from runmat_tpu.ops.pallas.threefry import (normal_pallas, raw_words_pallas,
                                            uniform_pallas)


def test_raw_words_bit_parity():
    n = 1000
    fn = raw_words_pallas(n, interpret=True)
    w0, w1 = fn(7, 9, 100, 0)
    r0, r1 = ctrng.raw_words(np, (7, 9), 100, n)
    assert np.array_equal(np.asarray(w0), r0.astype(np.uint32))
    assert np.array_equal(np.asarray(w1), r1.astype(np.uint32))


def test_raw_words_counter_carry():
    # counter close to 2^32 exercises the low->high carry
    n = 64
    lo = np.uint32(0xFFFFFFF0)
    fn = raw_words_pallas(n, interpret=True)
    w0, w1 = fn(1, 2, int(lo), 5)
    r0, r1 = ctrng.raw_words(np, (1, 2), (int(lo) | (5 << 32)), n)
    assert np.array_equal(np.asarray(w0), r0.astype(np.uint32))
    assert np.array_equal(np.asarray(w1), r1.astype(np.uint32))


def test_uniform_parity():
    n = 777
    fn = uniform_pallas(n, interpret=True)
    u = np.asarray(fn(3, 4, 0, 0))
    ref, _nb = ctrng.uniform(np, (3, 4), 0, n, np.float32)
    assert np.array_equal(u, ref.astype(np.float32))


def test_normal_stream_matches():
    n = 500
    fn = normal_pallas(n, interpret=True)
    z = np.asarray(fn(11, 22, 1234, 0))
    ref, _nb = ctrng.normal(np, (11, 22), 1234, n, np.float32)
    assert np.allclose(z, ref.astype(np.float32), atol=1e-6)
    assert abs(z.mean()) < 0.15
    assert abs(z.std() - 1.0) < 0.1


# ---------------------------------------------------------- histogram kernel

def _matlab_hist_oracle(x, edges):
    want = np.zeros(len(edges) - 1)
    for v in x:
        if np.isnan(v):
            continue
        for b in range(len(edges) - 1):
            if (edges[b] <= v < edges[b + 1]) or \
                    (b == len(edges) - 2 and v == edges[-1]):
                want[b] += 1
    return want


def test_histogram_pallas_matlab_semantics():
    """Streaming Pallas histogram == MATLAB histcounts semantics: last bin
    right-closed, NaN and out-of-range dropped, exact counts."""
    from runmat_tpu.ops.pallas.histogram import histcounts_pallas
    rng = np.random.default_rng(3)
    for n, edges in [(1000, np.linspace(0, 1, 11)),
                     (4097, np.array([0.0, 0.25, 0.5, 1.0])),
                     (17, np.linspace(-1, 1, 5)),
                     (1024, np.linspace(0, 1, 129))]:
        x = (rng.random(n) * 1.3 - 0.15).astype(np.float32)
        x[::11] = np.nan
        x[5 % n] = np.float32(edges[-1])      # exact right edge
        fn = histcounts_pallas(n, len(edges) - 1, interpret=True)
        got = np.asarray(fn(x, edges.astype(np.float32)))
        want = _matlab_hist_oracle(x.astype(np.float64),
                                   edges.astype(np.float32)
                                   .astype(np.float64))
        assert np.array_equal(got, want), (n, len(edges) - 1)


def test_histogram_pallas_grid_accumulation():
    """Counts accumulate correctly across >1 grid steps (n > one block)."""
    from runmat_tpu.ops.pallas.histogram import histcounts_pallas
    n = 5000                                   # > 1024-element block
    x = np.concatenate([np.full(2000, 0.1), np.full(3000, 0.9)]) \
        .astype(np.float32)
    edges = np.array([0.0, 0.5, 1.0], dtype=np.float32)
    fn = histcounts_pallas(n, 2, interpret=True)
    got = np.asarray(fn(x, edges))
    assert got.tolist() == [2000.0, 3000.0]


def test_affine_edge_params_detection():
    from runmat_tpu.ops.pallas.histogram import affine_edge_params
    import numpy as np
    # linspace over a binary range: detected with exact (k, m)
    assert affine_edge_params(np.linspace(0, 1, 65,
                                          dtype=np.float32)) == (6, 0)
    assert affine_edge_params(((np.arange(17) - 4) * 2.0)
                              .astype(np.float32)) == (-1, -4)
    # non-pow2 width / non-integer offset / non-uniform: rejected
    assert affine_edge_params(np.linspace(0, 1, 11,
                                          dtype=np.float32)) is None
    assert affine_edge_params(np.array([0.3, 0.8, 1.3],
                                       np.float32)) is None
    assert affine_edge_params(np.array([0, 1, 3], np.float32)) is None


def test_histogram_affine_matlab_semantics():
    """Two-level one-hot/MXU kernel (interpret mode): exact MATLAB
    semantics — last bin right-closed, NaN/out-of-range drop — on affine
    pow2 edges, including boundary hits and multi-grid accumulation."""
    from runmat_tpu.ops.pallas.histogram import (affine_edge_params,
                                                 histcounts_pallas_affine)
    import numpy as np
    rng = np.random.default_rng(3)
    for nb, k, m in [(64, 6, 0), (16, -1, -4), (100, 3, 8)]:
        edges = ((m + np.arange(nb + 1)) * 2.0 ** -k).astype(np.float32)
        assert affine_edge_params(edges) == (k, m)
        n = 4000
        span = float(edges[-1] - edges[0])
        x = (rng.random(n, dtype=np.float32) * span * 1.2
             + edges[0] - 0.1 * span).astype(np.float32)
        x[::500] = np.nan
        x[5] = edges[0]
        x[6] = edges[-1]                       # right-closed last bin
        x[7] = edges[nb // 2]                  # interior boundary hit
        fn = histcounts_pallas_affine(n, nb, k, m, interpret=True,
                                      blk_e=256)
        got = np.asarray(fn(x))
        ref = np.histogram(x[~np.isnan(x)],
                           bins=edges.astype(np.float64))[0]
        assert np.array_equal(got, ref), (nb, k, m)
