"""Grid-snap quantization: map every element to its nearest codebook entry.

This is the TPU-native replacement for the reference's CUDA extension
(ant_quantization/quant/quant_kernel.cu:12-62), which brute-force scans a
shared-memory codebook per element. Two behavioral rules are replicated:

1. The grid is sorted ascending and the CUDA loop updates on ``sub_v <=
   sub_min`` (quant_kernel.cu:31), so distance ties snap to the *larger*
   (later) grid value.
2. The op returns both the dequantized value and the code index (the CUDA
   kernel allocates but never fills the index; here it is real, because the
   TPU engine stores packed codes).

Implementation note (TPU): gathers and jnp.searchsorted route through the
scalar core / giant select lowering and are catastrophically slow at model
shapes — a per-channel 4-D weight snap through searchsorted + ``grid[codes]``
costs hundreds of ms where the arithmetic is microseconds. So every snap here
is pure VPU compare/select against the G-1 *midpoints* of the sorted grid:
``codes = sum_i [x >= mid_i]`` and the dequantized value is a select tree
(static G <= 33) or a lax.scan accumulation (the 8-bit 256-entry grids) — no
gathers anywhere. ``x >= (g_lo+g_hi)/2`` is exactly the CUDA kernel's
``d_hi <= d_lo`` tie-to-larger rule (quant_kernel.cu:29-36). A broadcast
compare variant (``snap_bruteforce``) is kept as the oracle for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["snap", "snap_codes", "snap_value", "snap_bruteforce",
           "snap_concat", "snap_concat_value", "snap_uniform"]

# Grids up to this many entries use fully-unrolled compare/select trees —
# XLA fuses the whole chain into ONE pass over x. Larger grids fall back
# to a lax.scan accumulation, which canNOT fuse across iterations: each
# of the G-1 steps is a separate full-tensor kernel (measured: a 256-
# entry scan-path snap at production activation shapes costs ~0.5 s/step
# and can wedge the TPU worker). 65 covers the 6-bit grids single-pass;
# 8-bit grids are uniform (bit > 6 forces the int codebook) and should
# use ``snap_uniform`` instead of the scan.
_UNROLL_MAX = 65


def _midpoint_codes(x: jax.Array, grid: jax.Array,
                    tie_hi=None) -> jax.Array:
    """codes = #{i : x > mid_i, or x == mid_i and tie_hi[i]} (tie_hi=None
    means always take the larger neighbor on exact midpoint ties)."""
    mids = (grid[1:] + grid[:-1]) * 0.5
    G = grid.shape[0]
    if G <= _UNROLL_MAX:
        idx = jnp.zeros(x.shape, jnp.int32)
        for i in range(G - 1):
            if tie_hi is None:
                take = x >= mids[i]
            else:
                take = (x > mids[i]) | ((x == mids[i]) & tie_hi[i])
            idx = idx + take.astype(jnp.int32)
        return idx

    def body(idx, im):
        m, th = im
        take = (x >= m) if tie_hi is None else \
            ((x > m) | ((x == m) & th))
        return idx + take.astype(jnp.int32), None

    th = jnp.ones((G - 1,), bool) if tie_hi is None else tie_hi
    idx, _ = jax.lax.scan(body, jnp.zeros(x.shape, jnp.int32), (mids, th))
    return idx


def _dequant(codes: jax.Array, grid: jax.Array, dtype) -> jax.Array:
    """grid[codes] without a gather: select tree / scan accumulation."""
    g = grid.astype(dtype)
    G = grid.shape[0]
    if G <= _UNROLL_MAX:
        out = jnp.full(codes.shape, g[0], dtype)
        for i in range(1, G):
            out = jnp.where(codes == i, g[i], out)
        return out

    def body(out, ig):
        i, gi = ig
        return jnp.where(codes == i, gi, out), None

    out, _ = jax.lax.scan(body, jnp.full(codes.shape, g[0], dtype),
                          (jnp.arange(1, G), g[1:]))
    return out


def snap_codes(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Return the index into ``grid`` (sorted ascending) of the nearest entry
    to each element of ``x``, ties going to the larger grid value."""
    return _midpoint_codes(x, grid.astype(x.dtype))


def snap(x: jax.Array, grid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Snap ``x`` onto ``grid``; returns (dequantized, codes)."""
    codes = snap_codes(x, grid)
    return _dequant(codes, grid, x.dtype), codes


def snap_value(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Snapped VALUES only, via a direct threshold/select chain:
    ``out = where(x >= mid_i, g[i+1], out)`` cumulatively — G-1 compares
    + G-1 selects, HALF the ops of snap()'s codes-then-dequant route
    (G-1 compares + adds, then G-1 equality compares + selects). Same
    midpoint tie-to-larger rule. The fake-quant hot paths (QAT forward)
    never need the codes."""
    g = grid.astype(x.dtype)
    mids = (g[1:] + g[:-1]) * 0.5
    G = g.shape[0]
    if G <= _UNROLL_MAX:
        out = jnp.full(x.shape, g[0], x.dtype)
        for i in range(G - 1):
            out = jnp.where(x >= mids[i], g[i + 1], out)
        return out

    def body(out, mg):
        m, gi = mg
        return jnp.where(x >= m, gi, out), None

    out, _ = jax.lax.scan(body, jnp.full(x.shape, g[0], x.dtype),
                          (mids, g[1:]))
    return out


def snap_uniform(x: jax.Array, grid: jax.Array,
                 size: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Snap onto a UNIFORMLY-SPACED sorted grid in O(1) ops: codes =
    round-half-up((x - g0)/step), clipped — exactly the midpoint rule
    with ties to the larger value.

    The >6-bit grids are always the int codebook (the reference forces
    int above 6 bits, ant quant_modules.py:482, olive :271), which is
    uniform, so the 256-entry 8-bit snaps never need a 255-step scan.

    ``size``: the grid's REAL entry count. Storage grids are padded to
    GRID_PAD=256 by repeating the max entry (calibrate/spec.py), and the
    real count is not statically known at a promoted site (255 for the
    signed int grids, 2^bit for unsigned) — so ``size=None`` derives the
    spacing *dynamically* from the grid itself: step = g[1]-g[0] (exact
    for any uniform grid, padded or not, with >=2 real entries) and the
    top code from (g[-1]-g[0])/step. Pass an int only when the real
    count is statically known. Dequantized values are reconstructed as
    g0 + codes*step — equal to the stored entries up to 1 ulp of the
    entry construction.
    """
    g = grid.astype(x.dtype)
    g0 = g[0]
    if size is None:
        # first adjacent difference -> real entry count; then recompute
        # the step from the ENDPOINTS so reconstruction error stays ~1 ulp
        # instead of accumulating across the grid
        top = jnp.round((g[-1] - g0) / (g[1] - g0))
        gmax = g[-1]
    else:
        top = size - 1
        gmax = g[size - 1]
    step = (gmax - g0) / top
    codes = jnp.clip(jnp.floor((x - g0) / step + 0.5), 0, top)
    return g0 + codes * step, codes.astype(jnp.int32)


def snap_bruteforce(x: jax.Array, grid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """O(N*G) oracle with the exact scan order of quant_kernel.cu:29-36:
    scan grid in given order, update when dist <= best (last argmin wins).
    Unlike ``snap`` the grid need not be sorted."""
    grid = grid.astype(x.dtype)
    d = jnp.abs(x[..., None] - grid)
    # last index among minima == first index among minima of the reversed scan
    codes = (grid.shape[0] - 1) - jnp.argmin(d[..., ::-1], axis=-1)
    return grid[codes], codes


def snap_concat(x: jax.Array, grid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Snap onto an *unsorted* grid with the CUDA scan's tie rule.

    OliVe concatenates the normal grid with the outlier grid without a
    global sort (olive quant_modules.py:304); the CUDA scan then breaks
    distance ties toward the entry appearing *later in the concatenation*
    (which for a negative-midpoint tie is the negative outlier, not the
    larger value). We sort once at trace time and carry the original
    positions so ties resolve identically.

    Returns (dequantized, codes) with codes indexing the *sorted* grid.
    """
    grid = grid.astype(x.dtype)
    order = jnp.argsort(grid, stable=True)   # original concat positions
    sg = grid[order]
    # per-midpoint tie direction: at the midpoint of (sg[i], sg[i+1]) the
    # CUDA scan keeps whichever appeared later in the concatenation
    tie_hi = order[1:] >= order[:-1]
    codes = _midpoint_codes(x, sg, tie_hi=tie_hi)
    return _dequant(codes, sg, x.dtype), codes


def snap_concat_value(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Values-only :func:`snap_concat` via the direct threshold/select
    chain (half the ops — see snap_value); same unsorted-concat tie
    rule."""
    grid = grid.astype(x.dtype)
    order = jnp.argsort(grid, stable=True)
    sg = grid[order]
    tie_hi = order[1:] >= order[:-1]
    mids = (sg[1:] + sg[:-1]) * 0.5
    G = sg.shape[0]
    if G <= _UNROLL_MAX:
        out = jnp.full(x.shape, sg[0], x.dtype)
        for i in range(G - 1):
            take = (x > mids[i]) | ((x == mids[i]) & tie_hi[i])
            out = jnp.where(take, sg[i + 1], out)
        return out

    def body(out, mtg):
        m, th, gi = mtg
        take = (x > m) | ((x == m) & th)
        return jnp.where(take, gi, out), None

    out, _ = jax.lax.scan(body, jnp.full(x.shape, sg[0], x.dtype),
                          (mids, tie_hi, sg[1:]))
    return out
