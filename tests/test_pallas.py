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
