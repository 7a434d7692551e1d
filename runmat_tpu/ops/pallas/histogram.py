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


def affine_edge_params(edges: np.ndarray):
    """If `edges` (ascending, B+1 of them) is EXACTLY (m + k) * w in f32
    for integer m and power-of-two w, return (log2(1/w), m) else None.
    Under these conditions y = x * 2^j - m is computed exactly in f32
    (power-of-two scaling is exact; the subtraction is exact for in-range
    results — see histcounts_pallas_affine), so the fast kernel's integer
    bin tests agree bitwise with direct comparisons against the edges."""
    e = np.asarray(edges, np.float32).reshape(-1)
    if e.size < 2:
        return None
    w = float(e[1]) - float(e[0])
    if not (w > 0 and np.isfinite(w)):
        return None
    j = np.log2(w)
    if j != np.round(j) or abs(j) > 40:
        return None
    m = float(e[0]) / w
    if m != np.round(m) or abs(m) > (1 << 18):
        return None
    k = int(-j)
    mi = int(np.round(m))
    recon = ((mi + np.arange(e.size)) * w).astype(np.float32)
    if not np.array_equal(recon, e):
        return None
    return k, mi


def histcounts_pallas_affine(n: int, n_bins: int, k_exp: int, m: int,
                             interpret: bool = False, blk_e: int = 0,
                             rows: int = 16):
    """Streaming histogram for EXACT-AFFINE power-of-two edges
    (e_k = (m + k) * 2^-k_exp): the two-level one-hot/MXU formulation.

    Per element the VPU computes y = x * 2^k_exp - m (exact), an integer
    bin index, and its (coarse, fine) split; per ROWS-row block two skinny
    one-hots CT (ROWS*coarse, E) and FT (ROWS*fine, E) are built by
    iota-compare (elements on LANES -> full vector utilization) and the
    joint histogram falls out of ONE MXU contraction over the lane dim:

        counts[c, f] += CT @ FT'     (0/1 products are exact in bf16;
                                      f32 accumulation exact to 2^24/step)

    The FULL (CR, FR) product — diagonal blocks plus cross-row junk — is
    accumulated into one i32 VMEM scratch slab each step (a single add);
    the block-diagonal extraction happens OUTSIDE the kernel in XLA on the
    final (CR, FR) result, so the in-kernel per-step cost is just the
    builds and the dot. ROWS=16 fills the 128x128 MXU tile exactly for
    B=64 (coarse=fine=8).

    Measured on v5e (K-differenced, tunnel overhead removed): 103 GB/s vs
    98 for in-kernel extraction and 27 for compare-per-edge at the same
    width. The kernel is VPU-ISSUE-BOUND, not HBM-bound: the one-hot
    builds fundamentally write (coarse+fine) amplified cells per element
    (~16x data amplification, the minimum for a two-level split of B=64
    since coarse+fine >= 2*sqrt(B)), and the v5e VPU retires ~1.7e12
    lane-ops/s — a ~180 GB/s formulation ceiling, independent of HBM
    bandwidth. Attribution on-chip: pure streaming 780 GB/s, + index
    chain 700 GB/s, + one-hot builds ~100 GB/s; bf16/int8-packed builds
    do not help (Mosaic executes bf16 elementwise at f32 rate, and bf16
    `==` is not lowerable at all on this toolchain).

    MATLAB semantics preserved exactly: bin k is [e_k, e_{k+1}) with the
    last bin right-closed; NaN and out-of-range drop."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = n_bins
    fine = min(B, 8)
    coarse = (B + fine - 1) // fine
    ROWS = rows
    if blk_e <= 0:
        # light autotune by problem size: keep the grid deep enough to
        # pipeline (>= 8 steps) but blocks large enough to amortize
        # per-step overhead (measured flat 8k..32k for 50M on v5e)
        blk_e = 8192
        while blk_e > 512 and (max(n, 1) + ROWS * blk_e - 1) \
                // (ROWS * blk_e) < 8:
            blk_e //= 2
    CR, FR = ROWS * coarse, ROWS * fine
    blk = ROWS * blk_e
    padded = ((max(n, 1) + blk - 1) // blk) * blk
    grid = padded // blk
    invw = float(2.0 ** k_exp)
    mf = float(m)
    Bf = float(B)

    def kernel(b_ref, x_ref, o_ref, acc_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...]                             # (ROWS, blk_e) f32
        # b_ref is a 1-element SMEM scalar, ALWAYS ZERO in value: callers
        # benchmarking repeated applications pass a carry-dependent zero so
        # XLA cannot hoist the loop-invariant kernel call (the elementwise
        # add folds into the scale multiply — no extra HBM pass, unlike
        # perturbing x itself, which materializes a full copy)
        y = x * invw - (mf + b_ref[0])             # exact (see docstring)
        idx = jnp.minimum(jnp.floor(y), Bf - 1.0)  # right-closed last bin
        # single-compare validity: y > B or NaN -> -fine (c = -1, matches
        # no coarse slot); y < 0 needs no compare at all — floor(y) <= -1
        # already lands c <= -1. Saves two full-width ops vs (>=0)&(<=B).
        idx = jnp.where(y <= Bf, idx, -float(fine))
        c = jnp.floor(idx * (1.0 / fine))
        fv = idx - c * fine
        # ONE stacked dot instead of a per-row loop: row r's coarse one-hot
        # occupies sublanes [r*coarse, (r+1)*coarse) of CT (ROWS*coarse, E)
        # and likewise FT — ROWS*coarse = 128 fills the MXU tile exactly
        # (8 separate (8,E)x(E,8) dots each waste 255/256 of the padded
        # 128x128 array and measured 4x slower). Off-diagonal blocks of
        # the product pair different rows' one-hots at the same lane —
        # junk that the outside extraction ignores. The iota is a thin
        # (S, 1) column (target value s % coarse for stacked slot s).
        rr_c = (lax.broadcasted_iota(jnp.int32, (CR, 1), 0)
                % coarse).astype(jnp.float32)
        rr_f = (lax.broadcasted_iota(jnp.int32, (FR, 1), 0)
                % fine).astype(jnp.float32)
        crep = jnp.repeat(c, coarse, axis=0)           # (CR, E)
        frep = jnp.repeat(fv, fine, axis=0)
        # bf16 one-hots: 0/1 are exact in bf16 and the MXU runs a single
        # pass; accumulation stays f32 via the preferred type
        ct = (crep == rr_c).astype(jnp.bfloat16)
        ft = (frep == rr_f).astype(jnp.bfloat16)
        big = lax.dot_general(ct, ft, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        # accumulate the WHOLE product in VMEM scratch (one add) — the
        # per-step diagonal extraction loop serialized the VPU; per-step
        # amounts are <= blk_e < 2^24 so the f32->i32 convert is exact
        acc_ref[...] += big.astype(jnp.int32)

        @pl.when(pid == grid - 1)
        def _fin():
            o_ref[...] = acc_ref[...]

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec((ROWS, blk_e), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CR, FR), lambda i, b: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((CR, FR), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((CR, FR), jnp.int32),
        interpret=interpret,
    )

    def fn(x, edges=None, bias=None):
        x = jnp.asarray(x, np.float32).reshape(-1)
        pad = padded - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), jnp.nan, np.float32)])
        b = jnp.zeros((1,), np.float32) if bias is None else \
            jnp.asarray(bias, np.float32).reshape(1)
        with jax.enable_x64(False):
            out = call(b, x.reshape(grid * ROWS, blk_e))
            # block-diagonal extraction (repeat layout): joint[cv, f] =
            # sum_r out[r*coarse + cv, r*fine + f] — tiny XLA on (CR, FR)
            o3 = out.reshape(ROWS, coarse, FR)
            cols = (jnp.arange(ROWS, dtype=jnp.int32)[:, None] * fine
                    + jnp.arange(fine, dtype=jnp.int32)[None, :])
            take = jnp.broadcast_to(cols[:, None, :], (ROWS, coarse, fine))
            joint = jnp.sum(jnp.take_along_axis(o3, take, axis=2), axis=0)
            counts = joint.reshape(-1)[:B]
        return counts

    return fn


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

    def kernel(x_ref, e_ref, out_ref, acc_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

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
        # accumulate in VMEM scratch; write the output once at the end
        # (per-step read-modify-write of the revisited output block
        # serializes the grid pipeline — measured ~1.6x on v5e)
        for k in range(nslab):
            acc_ref[k * SUB:(k + 1) * SUB, :] += acc[k]

        @pl.when(pid == grid - 1)
        def _fin():
            out_ref[...] = acc_ref[...]

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
        scratch_shapes=[pltpu.VMEM((nslab * SUB, LANE), jnp.int32)],
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
