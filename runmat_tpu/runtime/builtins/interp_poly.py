"""Interpolation & misc math: interp1, interp2, spline hooks.

Reference parity: runmat-runtime/src/builtins/math/interpolation.
"""

from __future__ import annotations

import numpy as np

from ...errors import bad_arg
from ...values import MatArray, is_text, text_of
from ..registry import builtin


@builtin("interp1", category="math/interpolation", min_in=2, max_in=5)
def m_interp1(x, v=None, xq=None, method=None, extrap=None):
    hx = x.host().astype(np.float64).reshape(-1)
    if v is None:
        raise bad_arg("interp1", "Not enough inputs.")
    hv = v.host().astype(np.float64).reshape(-1)
    hq = xq.host().astype(np.float64) if xq is not None else None
    m = text_of(method) if method is not None and is_text(method) else "linear"
    if hq is None:
        raise bad_arg("interp1", "Query points required.")
    if m in ("linear",):
        r = np.interp(hq.reshape(-1), hx, hv, left=np.nan, right=np.nan)
    elif m in ("nearest",):
        idx = np.clip(np.searchsorted(hx, hq.reshape(-1)), 1, hx.size - 1)
        lo = hx[idx - 1]
        hi = hx[idx]
        pick = np.where(np.abs(hq.reshape(-1) - lo) <= np.abs(hi - hq.reshape(-1)), idx - 1, idx)
        r = hv[pick]
        out_of = (hq.reshape(-1) < hx[0]) | (hq.reshape(-1) > hx[-1])
        r = np.where(out_of, np.nan, r)
    elif m in ("previous",):
        idx = np.searchsorted(hx, hq.reshape(-1), side="right") - 1
        r = np.where(idx >= 0, hv[np.clip(idx, 0, hv.size - 1)], np.nan)
        r = np.where(hq.reshape(-1) > hx[-1], np.nan, r)
    elif m in ("next",):
        idx = np.searchsorted(hx, hq.reshape(-1), side="left")
        r = np.where(idx < hx.size, hv[np.clip(idx, 0, hv.size - 1)], np.nan)
        r = np.where(hq.reshape(-1) < hx[0], np.nan, r)
    elif m in ("pchip", "cubic", "spline"):
        r = _spline_eval(hx, hv, hq.reshape(-1), m)
    else:
        raise bad_arg("interp1", f"Unknown method '{m}'.")
    if extrap is not None and not is_text(extrap):
        ev = extrap.scalar_double()
        out_of = (hq.reshape(-1) < hx[0]) | (hq.reshape(-1) > hx[-1])
        r = np.where(out_of, ev, r)
    elif extrap is not None and is_text(extrap) and text_of(extrap) == "extrap":
        out_of = (hq.reshape(-1) < hx[0]) | (hq.reshape(-1) > hx[-1])
        slope_lo = (hv[1] - hv[0]) / (hx[1] - hx[0]) if hx.size > 1 else 0.0
        slope_hi = (hv[-1] - hv[-2]) / (hx[-1] - hx[-2]) if hx.size > 1 else 0.0
        q = hq.reshape(-1)
        r = np.where(q < hx[0], hv[0] + slope_lo * (q - hx[0]), r)
        r = np.where(q > hx[-1], hv[-1] + slope_hi * (q - hx[-1]), r)
    return MatArray(r.reshape(hq.shape), "double")


def _spline_eval(x, y, q, method):
    """Natural cubic spline (spline) / monotone pchip-ish evaluation."""
    n = x.size
    if n < 3:
        return np.interp(q, x, y)
    h = np.diff(x)
    if method == "spline":
        # natural cubic spline: solve tridiagonal for second derivatives
        a = np.zeros((n, n))
        b = np.zeros(n)
        a[0, 0] = 1.0
        a[-1, -1] = 1.0
        for i in range(1, n - 1):
            a[i, i - 1] = h[i - 1]
            a[i, i] = 2 * (h[i - 1] + h[i])
            a[i, i + 1] = h[i]
            b[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
        c = np.linalg.solve(a, b)
        bcoef = (np.diff(y) / h) - h * (2 * c[:-1] + c[1:]) / 3
        dcoef = np.diff(c) / (3 * h)
        idx = np.clip(np.searchsorted(x, q) - 1, 0, n - 2)
        dx = q - x[idx]
        return y[idx] + bcoef[idx] * dx + c[idx] * dx ** 2 + dcoef[idx] * dx ** 3
    # pchip: monotone cubic hermite
    d = np.diff(y) / h
    m = np.zeros(n)
    m[1:-1] = np.where(np.sign(d[:-1]) * np.sign(d[1:]) > 0,
                       2 / (1 / np.where(d[:-1] == 0, 1, d[:-1]) +
                            1 / np.where(d[1:] == 0, 1, d[1:])), 0.0)
    m[0] = d[0]
    m[-1] = d[-1]
    idx = np.clip(np.searchsorted(x, q) - 1, 0, n - 2)
    t = (q - x[idx]) / h[idx]
    h00 = 2 * t ** 3 - 3 * t ** 2 + 1
    h10 = t ** 3 - 2 * t ** 2 + t
    h01 = -2 * t ** 3 + 3 * t ** 2
    h11 = t ** 3 - t ** 2
    return h00 * y[idx] + h10 * h[idx] * m[idx] + h01 * y[idx + 1] + h11 * h[idx] * m[idx + 1]


@builtin("interp2", category="math/interpolation", min_in=3, max_in=6)
def m_interp2(*args):
    if len(args) >= 5:
        X, Y, V, XQ, YQ = args[:5]
        xv = X.host().astype(np.float64)
        yv = Y.host().astype(np.float64)
        x1 = xv[0, :] if xv.ndim == 2 and xv.shape[0] > 1 else xv.reshape(-1)
        y1 = yv[:, 0] if yv.ndim == 2 and yv.shape[1] > 1 else yv.reshape(-1)
        v = V.host().astype(np.float64)
        xq = XQ.host().astype(np.float64)
        yq = YQ.host().astype(np.float64)
    else:
        V, XQ, YQ = args[:3]
        v = V.host().astype(np.float64)
        x1 = np.arange(1, v.shape[1] + 1, dtype=np.float64)
        y1 = np.arange(1, v.shape[0] + 1, dtype=np.float64)
        xq = XQ.host().astype(np.float64)
        yq = YQ.host().astype(np.float64)
    # bilinear interpolation
    xq_f, yq_f = np.broadcast_arrays(xq, yq)
    xi = np.clip(np.searchsorted(x1, xq_f.reshape(-1)) - 1, 0, x1.size - 2)
    yi = np.clip(np.searchsorted(y1, yq_f.reshape(-1)) - 1, 0, y1.size - 2)
    tx = (xq_f.reshape(-1) - x1[xi]) / (x1[xi + 1] - x1[xi])
    ty = (yq_f.reshape(-1) - y1[yi]) / (y1[yi + 1] - y1[yi])
    r = (v[yi, xi] * (1 - tx) * (1 - ty) + v[yi, xi + 1] * tx * (1 - ty)
         + v[yi + 1, xi] * (1 - tx) * ty + v[yi + 1, xi + 1] * tx * ty)
    oob = (xq_f.reshape(-1) < x1[0]) | (xq_f.reshape(-1) > x1[-1]) | \
          (yq_f.reshape(-1) < y1[0]) | (yq_f.reshape(-1) > y1[-1])
    r = np.where(oob, np.nan, r)
    return MatArray(r.reshape(xq_f.shape), "double")
