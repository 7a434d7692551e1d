"""Pallas TPU kernel: grid-chunked Threefry2x32 bulk random generation.

Reference parity: the chunked Philox GPU generator
(crates/runmat-accelerate/src/backend/wgpu/provider/ops/random.rs:45-119) —
the reference advances a host-mirrored counter per chunk and generates each
chunk in one shader dispatch. TPU-native version: one pallas_call whose grid
blocks each compute their own counter range (`base + program_id * block`), so
an arbitrarily long stream is produced in VMEM-sized tiles with no host
involvement, bit-identical to the portable Threefry2x32 stream in
runmat_tpu/ops/ctrng.py.

The kernel is pure VPU work: add/xor/rotate u32 lanes (Threefry is chosen
over Philox exactly because the TPU VPU has no fast 32-bit multiply). Shapes
are padded to the f32 tile (8, 128); the tail is masked by the caller.

Measured on TPU v5e (axon): 10M normals take ~6 ms in this kernel vs ~1.3 ms
for the XLA-fused ctrng path (XLA fuses the whole threefry+Box-Muller chain
and tiles it better than the hand-blocked grid). The engine therefore keeps
the XLA path as the default; this kernel is the validated Pallas alternative
(bit-identical stream — see tests/test_pallas.py) and the template for ops
where XLA underperforms.
"""

from __future__ import annotations

import numpy as np

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA

BLOCK = 64 * 1024          # u32 blocks per grid step (2 words each)


def _kernel_body(jnp, k0, k1, c0, c1, rounds=20):
    """Threefry rounds on traced u32 arrays (same math as ctrng.threefry2x32,
    inlined for the kernel: jnp ops lower to VPU rotates)."""
    ks2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
    x0 = c0 + k0
    x1 = c1 + k1
    ks = (k1, ks2, k0)
    for chunk in range(rounds // 4):
        for r in _ROT[(chunk % 2) * 4:(chunk % 2) * 4 + 4]:
            x0 = x0 + x1
            x1 = (x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))
            x1 = x0 ^ x1
        x0 = x0 + ks[chunk % 3]
        x1 = x1 + ks[(chunk + 1) % 3] + jnp.uint32(chunk + 1)
    return x0, x1


def raw_words_pallas(n_blocks: int, interpret: bool = False):
    """Build a pallas_call producing (w0, w1) u32 arrays of n_blocks counter
    blocks. Returns fn(key0, key1, counter_lo, counter_hi) -> (w0, w1).

    Grid-blocked: each program computes BLOCK counters' worth of words in
    VMEM; counter indices derive from program_id so blocks are independent
    (the 'chunked generation' of the reference, with the chunk loop replaced
    by the grid)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANE = 128
    SUB = 8
    TILE = SUB * LANE
    block = min(BLOCK, max(TILE, ((n_blocks + TILE - 1) // TILE) * TILE))
    padded = ((n_blocks + block - 1) // block) * block
    grid = padded // block
    rows = block // LANE

    def kernel(k_ref, w0_ref, w1_ref):
        pid = pl.program_id(0)
        k0 = k_ref[0]
        k1 = k_ref[1]
        clo = k_ref[2]
        chi = k_ref[3]
        # counter index of each lane within this block
        row = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANE), 1)
        idx = row * jnp.uint32(LANE) + col + pid.astype(jnp.uint32) * jnp.uint32(block)
        c0 = clo + idx
        # 64-bit carry into the high word
        c1 = chi + (c0 < clo).astype(jnp.uint32)
        w0, w1 = _kernel_body(jnp, k0, k1, c0, c1)
        w0_ref[:, :] = w0
        w1_ref[:, :] = w1

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid * rows, LANE), jnp.uint32),
            jax.ShapeDtypeStruct((grid * rows, LANE), jnp.uint32),
        ),
        interpret=interpret,
    )

    def fn(key0, key1, counter_lo, counter_hi):
        k = jnp.array([key0, key1, counter_lo, counter_hi], dtype=jnp.uint32)
        w0, w1 = call(k)
        return w0.reshape(-1)[:n_blocks], w1.reshape(-1)[:n_blocks]

    return fn


def normal_pallas(n: int, interpret: bool = False):
    """n f32 standard normals from the Threefry stream — same Box-Muller
    contiguous-halves layout as ctrng.normal (f32 path)."""
    import jax.numpy as jnp

    m = (n + 1) // 2
    words = raw_words_pallas(m, interpret=interpret)

    def fn(key0, key1, counter_lo, counter_hi):
        w0, w1 = words(key0, key1, counter_lo, counter_hi)
        f = jnp.float32
        u1 = f(1.0) - (w0 >> jnp.uint32(8)).astype(f) * f(2.0 ** -24)
        u2 = (w1 >> jnp.uint32(8)).astype(f) * f(2.0 ** -24)
        r = jnp.sqrt(f(-2.0) * jnp.log(u1))
        th = f(2.0 * np.pi) * u2
        return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)])[:n]

    return fn


def uniform_pallas(n: int, interpret: bool = False):
    """n f32 uniforms in [0,1) — same stream layout as ctrng.uniform."""
    import jax.numpy as jnp

    nb = (n + 1) // 2
    words = raw_words_pallas(nb, interpret=interpret)

    def fn(key0, key1, counter_lo, counter_hi):
        w0, w1 = words(key0, key1, counter_lo, counter_hi)
        bits = jnp.concatenate([w0, w1])[:n]
        return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)

    return fn
