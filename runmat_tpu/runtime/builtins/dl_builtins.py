"""Deep-learning toolbox builtins (dlarray-style surface).

Reference parity: runmat-runtime/src/builtins/deep_learning/ (autodiff tape,
layers, adam, crossentropy, training). The TPU-native implementation lives in
runmat_tpu/dl (jax-grad based instead of a hand-rolled tape — jax IS the tape);
these builtins expose the MATLAB-level API. Round 1 registers the core
numeric ops; the training loop builtins land with the dl module.
"""

from __future__ import annotations

import numpy as np

from ...errors import bad_arg
from ...values import MatArray
from ..dispatch import binary, unary
from ..registry import builtin


@builtin("relu", category="deep_learning", min_in=1, max_in=1, accel_op="relu")
def m_relu(x):
    return binary("max2", x, MatArray.scalar(0.0))


@builtin("sigmoid", category="deep_learning", min_in=1, max_in=1)
def m_sigmoid(x):
    h = x.host().astype(np.float64)
    r = 1.0 / (1.0 + np.exp(-h))
    from ... import dtypes
    oc = "single" if x.mclass == "single" else "double"
    return MatArray(dtypes.cast_to_class(r, oc), oc)


@builtin("softmax", category="deep_learning", min_in=1, max_in=1)
def m_softmax(x):
    h = x.host().astype(np.float64)
    e = np.exp(h - np.max(h, axis=0, keepdims=True))
    r = e / np.sum(e, axis=0, keepdims=True)
    from ... import dtypes
    oc = "single" if x.mclass == "single" else "double"
    return MatArray(dtypes.cast_to_class(r, oc), oc)


@builtin("crossentropy", category="deep_learning", min_in=2, max_in=2)
def m_crossentropy(pred, target):
    p = pred.host().astype(np.float64)
    t = target.host().astype(np.float64)
    eps = 1e-12
    ce = -np.sum(t * np.log(np.clip(p, eps, 1.0))) / max(1, p.shape[1] if p.ndim > 1 else 1)
    return MatArray.scalar(float(ce))


@builtin("adamupdate", category="deep_learning", min_in=6, pass_nargout=True)
def m_adamupdate(p, g, m_avg, v_avg, it, lr, *rest, nargout=1):
    """[p, m, v] = adamupdate(p, g, m, v, iter, lr[, beta1, beta2, eps]).

    Reference parity: provider adam_update hook
    (runmat-accelerate-api/src/lib.rs:1582)."""
    beta1 = rest[0].scalar_double() if len(rest) > 0 else 0.9
    beta2 = rest[1].scalar_double() if len(rest) > 1 else 0.999
    eps = rest[2].scalar_double() if len(rest) > 2 else 1e-8
    hp = p.host().astype(np.float64)
    hg = g.host().astype(np.float64)
    hm = m_avg.host().astype(np.float64) if m_avg.size else np.zeros_like(hp)
    hv = v_avg.host().astype(np.float64) if v_avg.size else np.zeros_like(hp)
    t = it.scalar_double()
    lrv = lr.scalar_double()
    hm = beta1 * hm + (1 - beta1) * hg
    hv = beta2 * hv + (1 - beta2) * hg * hg
    mhat = hm / (1 - beta1 ** t)
    vhat = hv / (1 - beta2 ** t)
    hp = hp - lrv * mhat / (np.sqrt(vhat) + eps)
    from ... import dtypes
    oc = "single" if p.mclass == "single" else "double"
    res = [MatArray(dtypes.cast_to_class(hp, oc), oc),
           MatArray(dtypes.cast_to_class(hm, oc), oc),
           MatArray(dtypes.cast_to_class(hv, oc), oc)]
    return res[:max(1, nargout)]
