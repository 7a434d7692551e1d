"""Device general (nonsymmetric) eigenvalues: Hessenberg + Francis QR.

The one provider-contract hole through round 3 was `eig` for general
matrices: jnp.linalg.eig only lowers on CPU, so every eigen-loop paid a
host round trip per iteration (VERDICT r3 #4; ≙ the reference's provider
decomposition hooks, runmat-accelerate-api/src/lib.rs:2422-2530).

This module implements the classic dense real-Schur pipeline as ONE jitted
device program in real f64 arithmetic (no complex kernels — complex128
compiles stall this TPU's compile service):

1. `hessenberg`: n-2 masked full-width Householder similarities — O(n^3)
   total, each step two rank-1 updates of the full matrix (MXU/VPU
   friendly).
2. `francis_qr`: implicit double-shift bulge-chasing sweeps on the active
   trailing block [lo, hi] inside a lax.while_loop, with subdiagonal
   deflation, exceptional shifts every 10 stalled iterations, and a 40*n
   iteration safeguard. Each sweep is a fori_loop of 3-row/3-col
   dynamic-slice updates (exact orthogonal similarities of the whole
   padded matrix, so structure bookkeeping can't corrupt eigenvalues).
3. `eig_values`: read 1x1 / 2x2 blocks off the final quasi-triangular
   matrix; 2x2 blocks yield real or conjugate-complex pairs from the
   quadratic formula. Returns (wr, wi, ok) — ok=False when the iteration
   hit the safeguard (caller falls back to host LAPACK).

The matrix is padded by 3 rows/cols of zeros so every dynamic 3-slice is
in-bounds; padding is only ever read (as zeros), never written (the last
chase position is k = hi-2 <= n-3).
"""

from __future__ import annotations

import numpy as np

_EPS = float(np.finfo(np.float64).eps)


def hessenberg(jnp, A):
    """Reduce square real A to upper Hessenberg via Householder
    similarities (masked full-width updates; fori_loop over columns)."""
    from jax import lax
    n = A.shape[0]
    idx = jnp.arange(n)

    def step(k, H):
        x = H[:, k]
        m = idx > k                       # tail strictly below the diagonal
        m2 = idx > k + 1                  # entries the reflector must zero
        xt = jnp.where(m, x, 0.0)
        nrm = jnp.sqrt(jnp.sum(xt * xt))
        x1 = x[k + 1]
        alpha = -jnp.sign(jnp.where(x1 == 0, 1.0, x1)) * nrm
        v = xt - alpha * (idx == k + 1)
        vn2 = jnp.sum(v * v)
        # skip degenerate reflectors (column already reduced)
        safe = vn2 > 0
        v = jnp.where(safe, v / jnp.sqrt(jnp.where(safe, vn2, 1.0)), 0.0)
        # H <- (I - 2vv')H(I - 2vv')
        H = H - 2.0 * jnp.outer(v, v @ H)
        H = H - 2.0 * jnp.outer(H @ v, v)
        # exact zeros below the first subdiagonal of column k
        H = jnp.where((m2[:, None]) & (idx[None, :] == k), 0.0, H)
        return H

    return lax.fori_loop(0, max(n - 2, 0), step, A)


def _house3(jnp, x, y, z, use3):
    """Symmetric 3x3 Householder P with P @ [x,y,z] = [r,0,0]. When use3
    is False, z is forced to 0 so u2 == 0 and the third row/col of P is
    exactly identity (a 2-element reflector embedded in 3x3)."""
    z = jnp.where(use3, z, 0.0)
    nrm = jnp.sqrt(x * x + y * y + z * z)
    alpha = -jnp.sign(jnp.where(x == 0, 1.0, x)) * nrm
    u = jnp.stack([x - alpha, y, z])
    un2 = jnp.sum(u * u)
    safe = un2 > 0
    s = jnp.where(safe, 2.0 / jnp.where(safe, un2, 1.0), 0.0)
    return jnp.eye(3, dtype=x.dtype) - s * jnp.outer(u, u)


def francis_qr(jnp, H, n: int, max_iters: int):
    """Implicit double-shift QR with deflation on an (n+3)x(n+3) padded
    Hessenberg matrix (top-left n x n is the data). Returns (H, ok)."""
    from jax import lax
    N = H.shape[0]                        # n + 3
    idx = jnp.arange(N)
    # Frobenius norm is invariant under the orthogonal similarities of the
    # iteration: compute the absolute deflation floor once. Subdiagonals in
    # near-null clusters stagnate at ~eps*||H|| while their local diagonal
    # entries are themselves noise-level, so a purely relative test never
    # fires; the floor costs at most a backward-stable eps*||H||
    # perturbation (EISPACK hqr uses the same norm-based rescue).
    hfro = jnp.sqrt(jnp.sum(H * H))
    floor = 4.0 * _EPS * hfro

    def subdiag_small(H, i):
        # |H[i, i-1]| <= 8 eps (|H[i-1,i-1]| + |H[i,i]|) or <= 4 eps ||H||.
        # dlahqr uses 1x ulp for the relative test, but the full-width
        # masked updates here carry a few extra rounding terms and
        # clustered/defective spectra stagnate ~2-3x above the strict
        # threshold; 8x costs at most ~4e-15 relative perturbation.
        a = jnp.abs(H[i - 1, i - 1]) + jnp.abs(H[i, i])
        a = jnp.where(a == 0, 1.0, a)
        s = jnp.abs(H[i, i - 1])
        return (s <= 8.0 * _EPS * a) | (s <= floor)

    def chase(H, lo, hi, x, y, z):
        """One bulge-chasing sweep: positions lo..hi-2 are 3-element
        reflectors on rows k..k+2; position hi-1 is the final 2-element
        rotation on rows hi-1, hi (third row/col of P exactly identity,
        so the row below hi — deflated data or padding — is untouched)."""
        def pos(k, st):
            H, x, y, z = st
            use3 = k + 2 <= hi
            P = _house3(jnp, x, y, z, use3)
            k0 = jnp.zeros((), k.dtype)
            R = lax.dynamic_slice(H, (k, k0), (3, N))
            H = lax.dynamic_update_slice(H, P @ R, (k, k0))
            C = lax.dynamic_slice(H, (k0, k), (N, 3))
            H = lax.dynamic_update_slice(H, C @ P, (k0, k))
            # after position k the bulge sits in column k, rows k+1..k+3;
            # the next reflector zeroes H[k+2, k], H[k+3, k] into H[k+1, k]
            nx = H[k + 1, k]
            ny = H[k + 2, k]
            nz = jnp.where(k + 3 <= hi, H[k + 3, k], 0.0)
            return (H, nx, ny, nz)

        H, _, _, _ = lax.fori_loop(lo, hi, pos, (H, x, y, z))
        # restore exact Hessenberg zeros below the first subdiagonal in the
        # active window (bulge remnants are O(eps) but must not linger)
        r = idx[:, None]
        c = idx[None, :]
        act = (r >= lo) & (r <= hi) & (c >= lo) & (c <= hi)
        return jnp.where(act & (r > c + 1), 0.0, H)

    def body(st):
        H, hi, stall, it = st
        # fresh block start: largest i <= hi whose subdiagonal is
        # NEGLIGIBLE (dlahqr's "m" scan — starting the bulge above a
        # negligible subdiagonal washes out the shift information, which
        # stalls graded matrices forever). The chosen subdiagonal is set
        # to exact zero so the split is clean.
        dabs = jnp.abs(jnp.diagonal(H))
        aprev = jnp.concatenate([dabs[:1] * 0.0, dabs[:-1]])
        a_all = aprev + dabs
        a_all = jnp.where(a_all == 0, 1.0, a_all)
        sb = jnp.abs(H[idx, jnp.maximum(idx - 1, 0)])
        smallv = (sb <= 8.0 * _EPS * a_all) | (sb <= floor)
        cand = (idx >= 1) & (idx <= hi) & smallv
        lo = jnp.max(jnp.where(cand, idx, 0)).astype(jnp.int32)
        H = H.at[lo, jnp.maximum(lo - 1, 0)].set(
            jnp.where(lo > 0, 0.0, H[0, jnp.maximum(lo - 1, 0)]))

        small_hi = subdiag_small(H, hi)
        small_hi1 = (hi - 2 >= lo) & subdiag_small(H, hi - 1)
        tiny = hi - lo <= 1                # converged 1x1/2x2 block

        # branch 0: deflate one (zero subdiag at hi, hi -= 1)
        # branch 1: deflate a 2x2 (zero subdiag at hi-1, hi -= 2)
        # branch 2: skip a converged tiny block (hi = lo - 1)
        # branch 3: Francis sweep on [lo, hi]
        b = jnp.where(small_hi, 0,
                      jnp.where(small_hi1, 1, jnp.where(tiny, 2, 3)))

        H = jnp.where(b == 0, H.at[hi, hi - 1].set(0.0),
                      jnp.where(b == 1, H.at[hi - 1, hi - 2].set(0.0), H))
        new_hi = jnp.where(b == 0, hi - 1,
                           jnp.where(b == 1, hi - 2,
                                     jnp.where(b == 2, lo - 1, hi)))

        def sweep(H):
            # shifts from the trailing 2x2 (exceptional every 10 stalls)
            t11 = H[hi - 1, hi - 1]
            t12 = H[hi - 1, hi]
            t21 = H[hi, hi - 1]
            t22 = H[hi, hi]
            s = t11 + t22
            p = t11 * t22 - t12 * t21
            exc = (stall > 0) & (stall % 10 == 0)
            ssum = jnp.abs(t21) + jnp.abs(H[hi - 1, hi - 2])
            s = jnp.where(exc, 2.0 * (t22 + 0.75 * ssum), s)
            p = jnp.where(exc, (t22 + 0.75 * ssum) ** 2, p)
            h11 = H[lo, lo]
            h12 = H[lo, lo + 1]
            h21 = H[lo + 1, lo]
            h22 = H[lo + 1, lo + 1]
            h32 = H[lo + 2, lo + 1]
            x = h11 * h11 + h12 * h21 - s * h11 + p
            y = h21 * (h11 + h22 - s)
            z = h32 * h21
            return chase(H, lo, hi, x, y, z)

        H = lax.cond(b == 3, sweep, lambda H: H, H)
        stall = jnp.where(b == 3, stall + 1, jnp.zeros((), stall.dtype))
        return (H, new_hi, stall, it + 1)

    def cond(st):
        _, hi, _, it = st
        return (hi >= 1) & (it < max_iters)

    hi0 = jnp.asarray(n - 1, jnp.int32)
    H, hi, stall, it = lax.while_loop(
        cond, body,
        (H, hi0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))
    ok = hi < 1
    return H, ok


def balance(jnp, A, iters: int = 8):
    """Parlett-Reinsch-style balancing: diagonal similarity D^-1 A D with
    power-of-2 scales equalizing off-diagonal row/column 1-norms
    (simultaneous fixed-sweep variant — each sweep halves the log
    imbalance, so 8 sweeps settle any f64-representable grading). MATLAB
    eig balances by default; without it, graded matrices (rows spanning
    ~10^16) lose most eigenvalue accuracy in the QR iteration."""
    from jax import lax

    def step(_, A):
        d = jnp.abs(jnp.diagonal(A))
        r = jnp.sum(jnp.abs(A), axis=1) - d       # off-diag row norms
        c = jnp.sum(jnp.abs(A), axis=0) - d       # off-diag col norms
        ok = (r > 0) & (c > 0)
        e = jnp.round(0.5 * jnp.log2(jnp.where(ok, r / c, 1.0)))
        f = jnp.exp2(jnp.clip(e, -512.0, 512.0))  # power of 2: exact scale
        return A * (f[None, :] / f[:, None])

    return lax.fori_loop(0, iters, step, A)


def eig_values(jnp, A):
    """Eigenvalues of a square real matrix on device: returns (wr, wi, ok).
    Quasi-triangular read-off: positions with a nonzero subdiagonal start a
    2x2 block whose eigenvalues come from the quadratic formula."""
    n = A.shape[0]
    if n == 0:
        z = jnp.zeros((0,), jnp.float64)
        return z, z, jnp.ones((), bool)
    if n == 1:
        return A.reshape(-1), jnp.zeros((1,), jnp.float64), \
            jnp.ones((), bool)
    A = balance(jnp, A.astype(jnp.float64))
    Hp = jnp.zeros((n + 3, n + 3), jnp.float64)
    Hp = Hp.at[:n, :n].set(hessenberg(jnp, A))
    Hp, ok = francis_qr(jnp, Hp, n, max_iters=40 * n + 100)
    d = jnp.diagonal(Hp)[:n]
    sup = jnp.diagonal(Hp, 1)[:n]          # H[i, i+1]
    sub = jnp.diagonal(Hp, -1)[:n - 1]     # H[i+1, i]
    sub = jnp.concatenate([sub, jnp.zeros((1,), jnp.float64)])
    is2 = sub != 0.0                       # i starts a 2x2 block
    # 2x2 block [a b; c d] at (i, i+1)
    a = d
    b = sup
    c = sub
    dd = jnp.concatenate([d[1:], jnp.zeros((1,), jnp.float64)])
    mean = 0.5 * (a + dd)
    disc = (0.5 * (a - dd)) ** 2 + b * c
    rt = jnp.sqrt(jnp.abs(disc))
    real_pair = disc >= 0
    # real pair: mean +/- rt ; complex pair: mean +/- i*rt
    wr1 = jnp.where(real_pair, mean + rt, mean)
    wr2 = jnp.where(real_pair, mean - rt, mean)
    wi1 = jnp.where(real_pair, 0.0, rt)
    wi2 = jnp.where(real_pair, 0.0, -rt)
    prev2 = jnp.concatenate([jnp.zeros((1,), bool), is2[:-1]])
    wr = jnp.where(is2, wr1, jnp.where(prev2, 0.0, d))
    wi = jnp.where(is2, wi1, 0.0)
    # second member of each block overwrites its own slot
    wr = jnp.where(prev2, jnp.concatenate(
        [jnp.zeros((1,), jnp.float64), wr2[:-1]]), wr)
    wi = jnp.where(prev2, jnp.concatenate(
        [jnp.zeros((1,), jnp.float64), wi2[:-1]]), wi)
    return wr, wi, ok
