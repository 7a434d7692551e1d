"""FFT & signal builtins: fft/ifft/fft2/ifft2/fftshift/filter/conv2.

Reference parity: runmat-runtime/src/builtins/math/{fft,signal} + provider
fft_dim/ifft_dim/conv2/iir_filter hooks (runmat-accelerate-api/src/lib.rs:
2535-2577). Host numpy path; device arrays route through the engine's fft ops.
"""

from __future__ import annotations

import numpy as np

from ...errors import MatError, bad_arg
from ...values import MatArray, text_of
from ..registry import builtin
from .common import scalar_int


def _cx(x: MatArray) -> np.ndarray:
    h = x.host()
    return h.astype(np.complex128 if h.dtype.kind != "c" else h.dtype)


def _default_dim(h: np.ndarray) -> int:
    for i, s in enumerate(h.shape):
        if s != 1:
            return i
    return 0


def _fft_impl(x, n, dim, inverse: bool):
    if isinstance(x, MatArray) and x.on_device:
        from ...accel import active_engine
        eng = active_engine()
        if eng is not None:
            r = eng.fft(x, n, dim, inverse)
            if r is not None:
                return r
    h = _cx(x)
    ax = (scalar_int(dim) - 1) if dim is not None else _default_dim(h)
    nn = scalar_int(n) if n is not None and n.size else None
    fn = np.fft.ifft if inverse else np.fft.fft
    r = fn(h, n=nn, axis=ax)
    out_class = "single" if x.mclass == "single" else "double"
    if inverse and not x.is_complex:
        if np.allclose(r.imag, 0, atol=1e-12):
            r = r.real
    if out_class == "single":
        r = r.astype(np.complex64 if np.iscomplexobj(r) else np.float32)
    return MatArray(r, out_class)


@builtin("fft", category="math/fft", min_in=1, max_in=3)
def m_fft(x, n=None, dim=None):
    return _fft_impl(x, n, dim, inverse=False)


@builtin("ifft", category="math/fft", min_in=1, max_in=3)
def m_ifft(x, n=None, dim=None):
    return _fft_impl(x, n, dim, inverse=True)


@builtin("fft2", category="math/fft", min_in=1, max_in=3)
def m_fft2(x, m=None, n=None):
    h = _cx(x)
    s = (scalar_int(m), scalar_int(n)) if m is not None and n is not None else None
    r = np.fft.fft2(h, s=s)
    return MatArray(r, "single" if x.mclass == "single" else "double")


@builtin("ifft2", category="math/fft", min_in=1, max_in=3)
def m_ifft2(x, m=None, n=None):
    h = _cx(x)
    s = (scalar_int(m), scalar_int(n)) if m is not None and n is not None else None
    r = np.fft.ifft2(h, s=s)
    return MatArray(r, "single" if x.mclass == "single" else "double")


@builtin("fftshift", category="math/fft", min_in=1, max_in=2)
def m_fftshift(x, dim=None):
    h = x.host()
    ax = scalar_int(dim) - 1 if dim is not None else None
    return MatArray(np.fft.fftshift(h, axes=ax), x.mclass)


@builtin("ifftshift", category="math/fft", min_in=1, max_in=2)
def m_ifftshift(x, dim=None):
    h = x.host()
    ax = scalar_int(dim) - 1 if dim is not None else None
    return MatArray(np.fft.ifftshift(h, axes=ax), x.mclass)


@builtin("filter", category="math/signal", min_in=3, max_in=4)
def m_filter(b, a, x, zi=None):
    """IIR direct-form-II-transposed filter (≙ provider iir_filter hook)."""
    bb = b.host().astype(np.float64).reshape(-1)
    aa = a.host().astype(np.float64).reshape(-1)
    if aa[0] == 0:
        raise bad_arg("filter", "First denominator coefficient must be nonzero.")
    bb = bb / aa[0]
    aa = aa / aa[0]
    h = x.host().astype(np.float64)
    is_col = h.ndim == 2 and h.shape[1] == 1
    v = h.reshape(-1)
    n = max(len(aa), len(bb))
    bb = np.pad(bb, (0, n - len(bb)))
    aa = np.pad(aa, (0, n - len(aa)))
    z = np.zeros(n - 1)
    if zi is not None:
        z0 = zi.host().astype(np.float64).reshape(-1)
        z[:len(z0)] = z0
    y = np.empty_like(v)
    for i in range(v.size):
        xi = v[i]
        yi = bb[0] * xi + (z[0] if n > 1 else 0.0)
        for k in range(n - 2):
            z[k] = bb[k + 1] * xi + z[k + 1] - aa[k + 1] * yi
        if n > 1:
            z[n - 2] = bb[n - 1] * xi - aa[n - 1] * yi
        y[i] = yi
    out = y.reshape(-1, 1) if is_col else y.reshape(1, -1)
    return MatArray(out, "single" if x.mclass == "single" else "double")


@builtin("conv2", category="math/signal", min_in=2, max_in=3)
def m_conv2(a, b, shape=None):
    ha = a.host().astype(np.float64)
    hb = b.host().astype(np.float64)
    mode = text_of(shape) if shape is not None else "full"
    # direct 2-D convolution via FFT for large kernels, sliding otherwise
    out_full_shape = (ha.shape[0] + hb.shape[0] - 1, ha.shape[1] + hb.shape[1] - 1)
    r = np.fft.irfft2(np.fft.rfft2(ha, out_full_shape) * np.fft.rfft2(hb, out_full_shape),
                      out_full_shape)
    if mode == "same":
        r0 = (hb.shape[0] - 1) // 2
        c0 = (hb.shape[1] - 1) // 2
        r = r[r0:r0 + ha.shape[0], c0:c0 + ha.shape[1]]
    elif mode == "valid":
        r = r[hb.shape[0] - 1:ha.shape[0], hb.shape[1] - 1:ha.shape[1]]
    out_class = "single" if a.mclass == "single" else "double"
    from ... import dtypes
    return MatArray(dtypes.cast_to_class(r, out_class), out_class)


@builtin("xcorr", category="math/signal", min_in=1, max_in=2)
def m_xcorr(a, b=None):
    va = a.host().astype(np.float64).reshape(-1)
    vb = b.host().astype(np.float64).reshape(-1) if b is not None else va
    r = np.correlate(va, vb, mode="full")
    return MatArray(r.reshape(1, -1), "double")
