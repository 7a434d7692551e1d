"""Philox4x32-10 counter-based RNG with identical host (numpy) and device (jax)
streams.

Reference parity: the wgpu Philox RNG with host-mirrored state
(crates/runmat-accelerate/src/backend/wgpu/provider/ops/random.rs:6-119): the
session holds (key, counter); every draw consumes a deterministic number of
128-bit blocks, so gather-parity holds regardless of where a draw executed, and
chunked generation advances the same counter. `rng(seed)` resets the stream.

The 32x32->64 multiply is done via 16-bit limbs in pure uint32 so the same code
runs on numpy and on TPU XLA (no 64-bit integer ops on the device hot path).

Stream contract (host vs device parity):
  * uniform draws (rand/randi/randperm) are BIT-EXACT across numpy and every
    jax backend — they are pure integer + exact float scaling.
  * normal draws (randn) consume the identical uniform stream and block count,
    but the Box-Muller transcendentals (log/cos/sin) go through each backend's
    libm, so values agree only to a few ULPs across backends (like the
    reference, whose WGSL Box-Muller is not bit-identical to its host libm).
  * the (key, counter) state advance is identical everywhere, so draws can
    migrate between host and device mid-stream without desync.
"""

from __future__ import annotations

import numpy as np

_M0 = 0xD2511F53
_M1 = 0xCD9E8D57
_W0 = 0x9E3779B9
_W1 = 0xBB67AE85
_MASK = 0xFFFFFFFF


def _u32(xp, v):
    return xp.asarray(v, dtype=xp.uint32)


def _mulhilo(xp, a, m: int):
    """(hi, lo) of a * m for u32 array a and python-int constant m."""
    alo = a & xp.uint32(0xFFFF)
    ahi = a >> xp.uint32(16)
    blo = np.uint32(m & 0xFFFF)
    bhi = np.uint32((m >> 16) & 0xFFFF)
    ll = alo * blo
    lh = alo * bhi
    hl = ahi * blo
    hh = ahi * bhi
    mid = (ll >> xp.uint32(16)) + (lh & xp.uint32(0xFFFF)) + (hl & xp.uint32(0xFFFF))
    lo = (ll & xp.uint32(0xFFFF)) | ((mid & xp.uint32(0xFFFF)) << xp.uint32(16))
    hi = hh + (lh >> xp.uint32(16)) + (hl >> xp.uint32(16)) + (mid >> xp.uint32(16))
    return hi, lo


def philox4x32(xp, c0, c1, c2, c3, k0: int, k1: int, rounds: int = 10):
    """Run the Philox4x32 bijection. c*: u32 arrays; k*: python ints."""
    k0a = np.uint32(k0)
    k1a = np.uint32(k1)
    for _ in range(rounds):
        hi0, lo0 = _mulhilo(xp, c0, _M0)
        hi1, lo1 = _mulhilo(xp, c2, _M1)
        n0 = hi1 ^ c1 ^ k0a
        n1 = lo1
        n2 = hi0 ^ c3 ^ k1a
        n3 = lo0
        c0, c1, c2, c3 = n0, n1, n2, n3
        k0a = k0a + xp.uint32(_W0) if xp is not np else np.uint32((int(k0a) + _W0) & _MASK)
        k1a = k1a + xp.uint32(_W1) if xp is not np else np.uint32((int(k1a) + _W1) & _MASK)
    return c0, c1, c2, c3


def raw_u32(xp, key: tuple[int, int], counter, n_blocks: int):
    """Generate n_blocks Philox blocks -> 4 u32 arrays of length n_blocks.

    counter: either a python int (64-bit starting block index) or a pair
    (lo, hi) of u32 values — possibly traced jax scalars, so the device path
    needs no 64-bit integer arithmetic and the counter can be a jit parameter.
    """
    if isinstance(counter, tuple):
        lo0, hi0 = counter
    else:
        lo0 = counter & _MASK
        hi0 = (counter >> 32) & _MASK
    if xp is np:
        i = np.arange(n_blocks, dtype=np.uint32)
    else:
        # plain 1-D iota: a (n,1) iota would be tiled T(1,128) on TPU and
        # padded 128x in HBM, OOMing large draws
        import jax
        i = jax.lax.iota(xp.uint32, n_blocks)
    with np.errstate(over="ignore"):
        c0 = _u32(xp, lo0) + i
        carry = (c0 < i).astype(xp.uint32)
        c1 = _u32(xp, hi0) + carry
        c2 = xp.zeros_like(c0)
        c3 = xp.zeros_like(c0)
        return philox4x32(xp, c0, c1, c2, c3, key[0], key[1])


def uniform_u32(xp, key, counter: int, n: int):
    """n u32 values (consuming ceil(n/4) blocks). Returns (vals, blocks).

    Word order is BLOCKED — [all c0 | all c1 | all c2 | all c3] — not
    interleaved: a (nb, 4) stack would be tiled T(8,128) on TPU and padded
    32x in HBM (observed OOM at 4K-image scale). Host numpy uses the same
    order, so the cross-backend stream contract is unaffected."""
    nb = (n + 3) // 4
    with np.errstate(over="ignore"):
        c0, c1, c2, c3 = raw_u32(xp, key, counter, nb)
        out = xp.concatenate([c0, c1, c2, c3])[:n]
    return out, nb


def uniform(xp, key, counter: int, n: int, dtype):
    """n uniforms in [0,1). f32 consumes 1 u32 each; f64 consumes 2."""
    if dtype in (np.float32, "float32", "single"):
        bits, nb = uniform_u32(xp, key, counter, n)
        vals = (bits >> xp.uint32(8)).astype(xp.float32) * xp.float32(2.0 ** -24)
        return vals, nb
    bits, nb = uniform_u32(xp, key, counter, 2 * n)
    hi = bits[0::2]
    lo = bits[1::2]
    v = (hi >> xp.uint32(5)).astype(xp.float64) * np.float64(2 ** 26) \
        + (lo >> xp.uint32(6)).astype(xp.float64)
    vals = v * np.float64(2.0 ** -53)
    return vals, nb


def normal(xp, key, counter: int, n: int, dtype):
    """n standard normals via Box-Muller. Deterministic consumption:
    m = 2*ceil(n/2) uniforms of the requested precision."""
    m = 2 * ((n + 1) // 2)
    u, nb = uniform(xp, key, counter, m, dtype)
    f = xp.float32 if dtype in (np.float32, "float32", "single") else xp.float64
    one = f(1.0)
    u1 = one - u[0::2]          # (0, 1]
    u2 = u[1::2]
    r = xp.sqrt(f(-2.0) * xp.log(u1))
    th = f(2.0 * np.pi) * u2
    z = xp.stack([r * xp.cos(th), r * xp.sin(th)], axis=1).reshape(-1)[:n]
    return z, nb


class PhiloxState:
    """Session RNG state: (key, counter). rng(seed) derives the key via one
    Philox pass over the seed (splitmix-style), matching on host and device."""

    __slots__ = ("seed", "key", "counter", "generator")

    def __init__(self, seed: int = 0):
        self.reseed(seed)
        self.generator = "philox"

    def reseed(self, seed: int) -> None:
        self.seed = int(seed) & ((1 << 64) - 1)
        s0 = np.uint32(self.seed & _MASK)
        s1 = np.uint32((self.seed >> 32) & _MASK)
        c0, c1, c2, c3 = philox4x32(
            np, np.array([s0]), np.array([s1]),
            np.array([0x243F6A88], dtype=np.uint32),
            np.array([0x85A308D3], dtype=np.uint32), 0x9E3779B9, 0xBB67AE85)
        self.key = (int(c0[0]), int(c1[0]))
        self.counter = 0

    def advance(self, blocks: int) -> int:
        """Reserve `blocks` Philox blocks; returns the starting counter."""
        start = self.counter
        self.counter += int(blocks)
        return start

    def state_tuple(self):
        return (self.seed, self.key, self.counter)


# ---------------- host convenience wrappers (session RNG) -------------------- #

def host_rand(state: PhiloxState, n: int, dtype) -> np.ndarray:
    nb = ((2 * n + 3) // 4) if dtype not in (np.float32, "single", "float32") else ((n + 3) // 4)
    start = state.advance(nb)
    vals, _ = uniform(np, state.key, start, n, dtype)
    return vals


def host_randn(state: PhiloxState, n: int, dtype) -> np.ndarray:
    m = 2 * ((n + 1) // 2)
    nb = ((2 * m + 3) // 4) if dtype not in (np.float32, "single", "float32") else ((m + 3) // 4)
    start = state.advance(nb)
    vals, _ = normal(np, state.key, start, n, dtype)
    return vals
