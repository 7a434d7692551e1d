"""Pallas TPU histogram: O(N + B) HBM traffic vs the broadcast-compare
form's O(N * B), with a layout-native compute scheme.

Algorithm: per-bin counts are DIFFERENCES OF CUMULATIVE COUNTS —
``count[k] = #(x >= e_k) - #(x >= e_{k+1})`` (last bin uses a strict
``#(x > e_B)`` so the right end is closed, per MATLAB). The kernel therefore
never builds a per-element one-hot: for each edge it does one (SUB, LANE)
vector compare against a scalar and one add into a per-edge accumulator
slab — all layout-native 2-D VPU ops. A naive one-hot kernel (elements
broadcast into the lane dimension) forces a lane->sublane relayout per tile
and measured 1.3 GB/s on v5e; the XLA broadcast-compare form measured
11.2 GB/s; this scheme is pure streaming compare-adds.

Each grid step covers J sub-tiles via an inner fori_loop: per-step grid
overhead (~µs) dominates at 1 KiB tiles. The (SLAB*SUB, LANE) partial-count
output is reduced and differenced OUTSIDE the kernel in XLA (tiny).
NaN padding makes tail masking free: NaN compares false against every edge.

≙ the reference's two-pass reduction family
(backend/wgpu/provider/ops/reduction) re-homed to Pallas
(SURVEY §2.4: grid-chunked kernels where XLA underperforms).

MATLAB semantics: bins are [e_b, e_{b+1}) with the LAST bin closed on the
right (x == e_B counts in bin B-1); NaN and out-of-range values drop.
"""

from __future__ import annotations

import numpy as np

LANE = 128
SUB = 8

# the per-edge accumulator slabs live in VMEM: (n_bins + 2) * SUB * LANE * 4
# bytes. 256 bins ~= 1 MiB — beyond that the broadcast-compare XLA form is
# used instead (accel/dense.py gate).
MAX_BINS = 256


def histcounts_pallas(n: int, n_bins: int, dtype=np.float32,
                      interpret: bool = False):
    """Build fn(x, edges) -> counts (n_bins,) int32 for fixed sizes.
    x: (n,) dtype; edges: (n_bins + 1,) dtype ascending. n_bins <= MAX_BINS."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if n_bins > MAX_BINS:
        raise ValueError(f"histcounts_pallas: n_bins {n_bins} > {MAX_BINS}")

    tile = SUB * LANE                      # elements per inner iteration
    J = 64                                 # sub-tiles per grid step (256 KiB)
    while J > 1 and (max(n, 1) + tile - 1) // tile < J:
        J //= 2
    blk = tile * J                         # data elements per grid step
    padded = ((max(n, 1) + blk - 1) // blk) * blk
    grid = padded // blk
    pe = ((n_bins + 1 + LANE - 1) // LANE) * LANE
    nslab = n_bins + 2                     # >= e_0..e_B, plus > e_B

    def kernel(x_ref, e_ref, out_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        # scalar edge loads hoisted out of the inner loop
        ev = [e_ref[0, k] for k in range(n_bins + 1)]

        def body(j, acc):
            x = x_ref[pl.ds(j * SUB, SUB), :]          # (SUB, LANE)
            # one compare-add per edge, all (SUB, LANE) vs scalar, carried
            # as a TUPLE of slabs (Mosaic has no scatter-add for .at[].add
            # on a stacked array). dtype pinned to int32: under
            # jax_enable_x64 bool casts default wider, and Mosaic cannot
            # lower 64-bit types.
            ge = tuple(acc[k] + (x >= ev[k]).astype(jnp.int32)
                       for k in range(n_bins + 1))
            gt_last = acc[n_bins + 1] + (x > ev[n_bins]).astype(jnp.int32)
            return ge + (gt_last,)

        zero = jnp.zeros((SUB, LANE), jnp.int32)
        acc = lax.fori_loop(0, J, body, tuple(zero for _ in range(nslab)))
        for k in range(nslab):
            out_ref[k * SUB:(k + 1) * SUB, :] += acc[k]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUB * J, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pe), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nslab * SUB, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nslab * SUB, LANE), jnp.int32),
        interpret=interpret,
    )

    def fn(x, edges):
        x = jnp.asarray(x, dtype).reshape(-1)
        pad = padded - x.shape[0]
        if pad:
            # NaN tail padding doubles as the tail mask: NaN compares false
            # against every edge, so padded elements count nowhere
            x = jnp.concatenate([x, jnp.full((pad,), jnp.nan, dtype)])
        e = jnp.asarray(edges, dtype).reshape(-1)
        epad = pe - e.shape[0]
        if epad:
            e = jnp.concatenate([e, jnp.full((epad,), jnp.inf, dtype)])
        # Trace the pallas_call with x64 OFF: under jax_enable_x64 the grid
        # index-map scalars trace as i64 and Mosaic refuses 64-bit types
        # ("failed to legalize func.return (i32, i64)"); the kernel itself
        # is entirely f32/i32, so narrowing the trace config is lossless.
        with jax.enable_x64(False):
            out = call(x.reshape(grid * SUB * J, LANE), e[None, :])
            # reduce the partial slabs + difference the cumulative counts
            ge = jnp.sum(out.reshape(nslab, tile), axis=1)   # (nslab,) i32
            counts = ge[:n_bins] - ge[1:n_bins + 1]
            # last bin closed on the right: #(x >= e_{B-1}) - #(x > e_B)
            counts = counts.at[n_bins - 1].set(
                ge[n_bins - 1] - ge[n_bins + 1])
        return counts

    return fn
