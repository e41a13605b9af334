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

Instead of an O(G) scan per element, ``snap`` uses a vectorized binary
search (jnp.searchsorted, O(log G)): with a sorted grid the nearest entry is
one of the two neighbors of the insertion point, and the tie rule picks the
right neighbor. XLA lowers this to a handful of fused VPU ops. A broadcast
compare variant (``snap_bruteforce``) is kept as the oracle for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["snap", "snap_codes", "snap_bruteforce", "snap_concat"]


def snap_codes(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Return the index into ``grid`` (sorted ascending) of the nearest entry
    to each element of ``x``, ties going to the larger grid value."""
    grid = grid.astype(x.dtype)
    idx = jnp.searchsorted(grid, x, side="left")
    lo = jnp.clip(idx - 1, 0, grid.shape[0] - 1)
    hi = jnp.clip(idx, 0, grid.shape[0] - 1)
    d_lo = jnp.abs(x - grid[lo])
    d_hi = jnp.abs(x - grid[hi])
    return jnp.where(d_hi <= d_lo, hi, lo)


def snap(x: jax.Array, grid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Snap ``x`` onto ``grid``; returns (dequantized, codes)."""
    grid = grid.astype(x.dtype)
    codes = snap_codes(x, grid)
    return grid[codes], codes


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
    idx = jnp.searchsorted(sg, x, side="left")
    lo = jnp.clip(idx - 1, 0, sg.shape[0] - 1)
    hi = jnp.clip(idx, 0, sg.shape[0] - 1)
    d_lo = jnp.abs(x - sg[lo])
    d_hi = jnp.abs(x - sg[hi])
    take_hi = (d_hi < d_lo) | ((d_hi == d_lo) & (order[hi] >= order[lo]))
    codes = jnp.where(take_hi, hi, lo)
    return sg[codes], codes
