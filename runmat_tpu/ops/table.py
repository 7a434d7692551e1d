"""Elementwise operation table shared by the host (numpy) and device (jax) paths.

Reference parity: the per-builtin BuiltinGpuSpec/BuiltinFusionSpec metadata
(e.g. runmat-runtime/src/builtins/math/trigonometry/sin.rs:23-38, 174-188) maps
each builtin to a provider hook + a WGSL expression template. Here one table maps
an op name to a function over an array namespace `xp` (numpy or jax.numpy), so
host eager execution and traced jax fusion share identical semantics.

MATLAB domain rules (sqrt(-1) -> i, log(-x) -> complex, etc.) are encoded as
`complex_when` predicates evaluated on *host* semantics before dispatch; the
device path receives the already-resolved output class.
"""

from __future__ import annotations

import numpy as np


def _xp_erf(xp, x):
    if xp is np:
        try:
            from math import erf
            return np.vectorize(erf, otypes=[np.float64])(x) if np.ndim(x) else erf(float(x))
        except Exception:  # pragma: no cover
            raise
    import jax
    return jax.scipy.special.erf(x)


# --- unary ops --------------------------------------------------------------- #
# name -> fn(xp, a)
UNARY = {
    "neg": lambda xp, a: xp.negative(a),
    "uplus": lambda xp, a: a,
    "abs": lambda xp, a: xp.abs(a),
    "sign": lambda xp, a: xp.sign(a),
    "sqrt": lambda xp, a: xp.sqrt(a),
    "exp": lambda xp, a: xp.exp(a),
    "expm1": lambda xp, a: xp.expm1(a),
    "log": lambda xp, a: xp.log(a),
    "log2": lambda xp, a: xp.log2(a),
    "log10": lambda xp, a: xp.log10(a),
    "log1p": lambda xp, a: xp.log1p(a),
    "sin": lambda xp, a: xp.sin(a),
    "cos": lambda xp, a: xp.cos(a),
    "tan": lambda xp, a: xp.tan(a),
    "asin": lambda xp, a: _matlab_asin(xp, a),
    "acos": lambda xp, a: _matlab_acos(xp, a),
    "atan": lambda xp, a: xp.arctan(a),
    "sinh": lambda xp, a: xp.sinh(a),
    "cosh": lambda xp, a: xp.cosh(a),
    "tanh": lambda xp, a: xp.tanh(a),
    "asinh": lambda xp, a: xp.arcsinh(a),
    "acosh": lambda xp, a: xp.arccosh(a),
    "atanh": lambda xp, a: xp.arctanh(a),
    "floor": lambda xp, a: xp.floor(a),
    "ceil": lambda xp, a: xp.ceil(a),
    "fix": lambda xp, a: xp.trunc(a),
    "round": lambda xp, a: xp.trunc(a + xp.where(a >= 0, 0.5, -0.5)),  # half away from zero
    "real": lambda xp, a: xp.real(a),
    "imag": lambda xp, a: xp.imag(a),
    "conj": lambda xp, a: xp.conj(a),
    "angle": lambda xp, a: xp.angle(a),
    "reciprocal": lambda xp, a: 1.0 / a,
    "square": lambda xp, a: a * a,
    "gamma": lambda xp, a: _gamma(xp, a),
    "erf": _xp_erf,
    "isnan": lambda xp, a: xp.isnan(a),
    "isinf": lambda xp, a: xp.isinf(a),
    "isfinite": lambda xp, a: xp.isfinite(a),
    "logical_not": lambda xp, a: xp.logical_not(a),
}


def _matlab_asin(xp, a):
    """MATLAB doc formula asin(z) = -i*log(i*z + sqrt(1-z^2)). Equals
    numpy's arcsin everywhere except ON the branch cut (real |x| > 1
    promoted to complex with +0 imag), where MATLAB's principal-sqrt
    composition gives asin(2) = pi/2 - 1.3170i vs numpy's +1.3170i."""
    import numpy as _np
    if _np.iscomplexobj(a):
        return -1j * xp.log(1j * a + xp.sqrt(1 - a * a))
    return xp.arcsin(a)


def _matlab_acos(xp, a):
    """MATLAB doc formula acos(z) = -i*log(z + i*sqrt(1-z^2));
    acos(2) = +1.3170i in MATLAB, -1.3170i in numpy (branch cut side)."""
    import numpy as _np
    if _np.iscomplexobj(a):
        return -1j * xp.log(a + 1j * xp.sqrt(1 - a * a))
    return xp.arccos(a)


def _matlab_pow(xp, a, b):
    """MATLAB power identities the underlying pow may miss (XLA's pow):
    x^0 is 1 for EVERY x including NaN/Inf; 1^y is 1 for every y. The
    repair applies ONLY where pow produced NaN — an unconditional
    where(a == 1, 1, r) would zero the autodiff gradient at a == 1
    (caught by test_dlarray.test_grad_square)."""
    r = xp.power(a, b)
    one = xp.asarray(1, dtype=r.dtype)
    bad = r != r                      # NaN (real or complex)
    return xp.where(bad & ((b == 0) | (a == 1)), one, r)


def _gamma(xp, a):
    if xp is np:
        from math import gamma as _g
        return np.vectorize(lambda v: _g(v) if v > 0 or v != np.floor(v) else np.inf,
                            otypes=[np.float64])(a)
    import jax
    return xp.exp(jax.scipy.special.gammaln(a)) * xp.where(
        (a % 2 >= 1) & (a < 0), -1.0, 1.0)  # reflection sign for negative non-int handled upstream


# --- binary ops -------------------------------------------------------------- #
# name -> fn(xp, a, b)
BINARY = {
    "add": lambda xp, a, b: xp.add(a, b),
    "sub": lambda xp, a, b: xp.subtract(a, b),
    "mul": lambda xp, a, b: xp.multiply(a, b),
    "div": lambda xp, a, b: xp.divide(a, b),
    "ldiv": lambda xp, a, b: xp.divide(b, a),
    "pow": lambda xp, a, b: _matlab_pow(xp, a, b),
    "atan2": lambda xp, a, b: xp.arctan2(a, b),
    "hypot": lambda xp, a, b: xp.hypot(a, b),
    "mod": lambda xp, a, b: _matlab_mod(xp, a, b),
    "rem": lambda xp, a, b: _matlab_rem(xp, a, b),
    "min2": lambda xp, a, b: xp.fmin(a, b),   # NaN-ignoring, MATLAB min(a,b)
    "max2": lambda xp, a, b: xp.fmax(a, b),
    "and": lambda xp, a, b: xp.logical_and(a != 0, b != 0),
    "or": lambda xp, a, b: xp.logical_or(a != 0, b != 0),
    "xor": lambda xp, a, b: xp.logical_xor(a != 0, b != 0),
    "lt": lambda xp, a, b: xp.less(a, b),
    "le": lambda xp, a, b: xp.less_equal(a, b),
    "gt": lambda xp, a, b: xp.greater(a, b),
    "ge": lambda xp, a, b: xp.greater_equal(a, b),
    "eq": lambda xp, a, b: xp.equal(a, b),
    "ne": lambda xp, a, b: xp.not_equal(a, b),
}

COMPARE_OPS = {"lt", "le", "gt", "ge", "eq", "ne"}
LOGICAL_OPS = {"and", "or", "xor"}


def _matlab_mod(xp, a, b):
    # doc mod: mod(a, 0) = a; result takes the SIGN OF THE DIVISOR. With an
    # infinite divisor and finite a: mod(a, Inf) = a when signs agree (or
    # a == 0), otherwise ±Inf (the divisor); mod(Inf, m) stays NaN.
    r = a - xp.floor(a / b) * b
    r = xp.where(b == 0, a, r)
    inf_b = xp.isinf(b) & xp.isfinite(a)
    same = (a >= 0) == (b > 0)
    return xp.where(inf_b, xp.where((a == 0) | same, a, b), r)


def _matlab_rem(xp, a, b):
    # doc rem: rem(a, 0) = NaN (float classes); result takes the SIGN OF
    # THE DIVIDEND; rem(a, ±Inf) = a for finite a.
    r = a - xp.trunc(a / b) * b
    r = xp.where(b == 0, xp.full_like(r, float("nan")), r)
    inf_b = xp.isinf(b) & xp.isfinite(a)
    return xp.where(inf_b, a, r)


# Arithmetic ops that, on MATLAB integer classes, compute in wide float and
# saturate on the way back (mirrors dispatch._INT_SAFE_BINARY's host path).
INT_SAT_BINARY = {"add", "sub", "mul", "div", "ldiv", "pow", "mod", "rem",
                  "min2", "max2"}


def saturate_cast_device(jnp, r, dt):
    """Device analog of dtypes.saturate_cast: MATLAB round-half-away +
    saturation into an integer dtype; NaN -> 0, +/-Inf -> class limits."""
    import numpy as np
    info = np.iinfo(dt)
    if np.dtype(r.dtype).kind == "c":
        r = jnp.real(r)
    rr = jnp.where(r >= 0, jnp.floor(r + 0.5), jnp.ceil(r - 0.5))
    rr = jnp.where(jnp.isnan(rr), 0.0, rr)
    rr = jnp.clip(rr, float(info.min), float(info.max))
    out = rr.astype(dt)
    if np.dtype(dt).itemsize == 8:
        # f64 can't represent the (u)int64 limits exactly; repair the ends
        out = jnp.where(rr >= float(info.max), np.array(info.max, dt), out)
        out = jnp.where(rr <= float(info.min), np.array(info.min, dt), out)
    return out


# Unary ops whose real-domain violation promotes to complex in MATLAB.
COMPLEX_PROMOTING_UNARY = {
    "sqrt": lambda h: (h < 0).any(),
    "log": lambda h: (h < 0).any(),
    "log2": lambda h: (h < 0).any(),
    "log10": lambda h: (h < 0).any(),
    "log1p": lambda h: (h < -1).any(),
    "asin": lambda h: ((h < -1) | (h > 1)).any(),
    "acos": lambda h: ((h < -1) | (h > 1)).any(),
    "acosh": lambda h: (h < 1).any(),
    "atanh": lambda h: ((h < -1) | (h > 1)).any(),
}

# Unary ops valid for complex inputs.
COMPLEX_OK_UNARY = {
    "neg", "uplus", "abs", "sqrt", "exp", "log", "log2", "log10", "sin", "cos",
    "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh", "asinh", "acosh",
    "atanh", "real", "imag", "conj", "angle", "reciprocal", "square", "isnan",
    "isinf", "isfinite", "expm1", "log1p", "round", "floor", "ceil", "fix",
    "sign",
}
