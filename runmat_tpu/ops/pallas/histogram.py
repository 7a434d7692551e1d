"""Pallas TPU histogram: O(N + B) HBM traffic vs the broadcast-compare
form's O(N * B).

The portable histcounts kernel (accel/dense.py _b_histcounts) materializes
an (N, B) hit matrix — every element is compared against every bin edge in
HBM-visible intermediates, so XLA underperforms for large N*B. This kernel
streams x through VMEM in grid blocks, does the (block, B) compare on-chip,
and accumulates per-bin counts across the sequential TPU grid into one
(1, B) output (read-modify-write across grid steps is sound on TPU because
grid iterations execute in order). ≙ the reference's two-pass reduction
family (backend/wgpu/provider/ops/reduction) re-homed to Pallas
(SURVEY §2.4: grid-chunked kernels where XLA underperforms).

MATLAB semantics: bins are [e_b, e_{b+1}) with the LAST bin closed on the
right (x == e_B counts in bin B-1); NaN and out-of-range values drop.
"""

from __future__ import annotations

import numpy as np

LANE = 128
SUB = 8


def histcounts_pallas(n: int, n_bins: int, dtype=np.float32,
                      interpret: bool = False):
    """Build fn(x, edges) -> counts (n_bins,) for fixed sizes.
    x: (n,) dtype; edges: (n_bins + 1,) dtype ascending."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = SUB * LANE                       # data elements per grid step
    padded = ((max(n, 1) + blk - 1) // blk) * blk
    grid = padded // blk
    pb = ((n_bins + LANE - 1) // LANE) * LANE     # padded bin lanes
    pe = ((n_bins + 1 + LANE - 1) // LANE) * LANE

    def kernel(x_ref, e_ref, out_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        x = x_ref[...]                     # (SUB, LANE)
        edges = e_ref[0, :]                # (pe,)
        # global element index for tail masking
        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
        gidx = pid * blk + row * LANE + col
        valid = gidx < n
        # bin index: count of edges <= x over the REAL edges only
        er = edges[:n_bins + 1]
        cnt = jnp.sum((x[:, :, None] >= er[None, None, :]),
                      axis=-1).astype(jnp.int32)
        b = cnt - 1
        last = edges[n_bins]
        inb = (b >= 0) & ((b < n_bins) | (x == last)) & valid & ~jnp.isnan(x)
        b = jnp.clip(b, 0, n_bins - 1)
        # one-hot accumulate into (1, pb)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, pb), 1)
        hits = (b[:, :, None] == lanes[None, :, :]) & inb[:, :, None]
        # int32 accumulation: exact to 2^31-1 counts per bin. A float32
        # accumulator silently saturates at 2^24 (~16.7M), which is
        # reachable in exactly the large-N regime this kernel targets.
        counts = jnp.sum(hits.astype(jnp.int32), axis=(0, 1))[None, :]
        out_ref[...] += counts

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pb), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, pb), jnp.int32),
        interpret=interpret,
    )

    def fn(x, edges):
        x = jnp.asarray(x, dtype).reshape(-1)
        pad = padded - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), jnp.nan, dtype)])
        e = jnp.asarray(edges, dtype).reshape(-1)
        epad = pe - e.shape[0]
        if epad:
            e = jnp.concatenate([e, jnp.full((epad,), jnp.inf, dtype)])
        out = call(x.reshape(-1, LANE).reshape(padded // LANE, LANE)
                   .reshape(grid * SUB, LANE), e[None, :])
        return out[0, :n_bins]

    return fn
