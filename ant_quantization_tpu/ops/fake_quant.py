"""Fake-quantization forward passes (ANT and OliVe) with straight-through
estimator gradients.

Replicates the arithmetic of the reference's ``Quantizer._forward``:
  scale = alpha / max(grid)                  (integer-domain grid)
  q     = snap(x / scale, grid)              (STE around the snap)
  out   = q * scale
ANT: ant_quantization/antquant/quant_modules.py:535-551.
OliVe adds the outlier grid concat + OVP victim zeroing *before* the STE:
olive_quantization/antquant/quant_modules.py:294-330.

Per-channel quantization broadcasts alpha along ``channel_axis`` (the
reference reshapes to (C, -1); any axis-aligned broadcast is equivalent).
Gradients flow through both x (straight-through) and alpha (via scale), the
same paths torch autograd sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .snap import (snap, snap_concat, snap_concat_value, snap_uniform,
                   snap_value)
from .ovp import apply_ovp

__all__ = ["ant_fake_quant", "olive_fake_quant", "expand_alpha"]


def _snap_sized(xs: jax.Array, grid: jax.Array, static_bit, dyn_bit):
    """Snap against a GRID_PAD-padded grid at the cost of its REAL size.

    The padded 256-entry storage keeps promotion a pure pytree transform
    (calibrate/spec.py), but snapping against all 256 entries takes the
    lax.scan path — G-1 *separate full-tensor passes* (~0.5 s/step at
    production activation shapes; see PERF.md). So:
      - static_bit <= 6: unrolled tree on the static slice grid[:2^bit]
        (one fused pass), with a lax.cond fallback for states promoted to
        8-bit at runtime (bit > 6 forces the *int* codebook — uniform —
        so the promoted branch is the O(1) ``snap_uniform``);
      - static_bit > 6: always the uniform path.
    ``static_bit=None`` keeps the legacy padded-scan behavior.
    """
    if static_bit is None:
        return snap_value(xs, grid)
    if static_bit > 6:
        return snap_uniform(xs, grid)[0]
    g_small = grid[: 2 ** static_bit]
    # BOTH branches are cheap (unrolled tree / O(1) uniform), so compute
    # both and select: a lax.cond here costs ~130 us per site per step in
    # XLA overhead and blocks fusion — the r4 trace showed 42 cond.clones
    # = 5.5 ms (+1.8 ms of copies) of the 9.6 ms resnet18 QAT overhead.
    # snap_value: direct threshold/select chain, half the VPU ops of the
    # codes-then-dequant route.
    return jnp.where(dyn_bit > 6, snap_uniform(xs, grid)[0],
                     snap_value(xs, g_small))


def expand_alpha(alpha: jax.Array, ndim: int, channel_axis: int | None) -> jax.Array:
    """Reshape a per-channel alpha vector (C,) so it broadcasts along
    ``channel_axis`` of an ndim-rank tensor; scalar alpha passes through."""
    if channel_axis is None:
        return jnp.asarray(alpha)
    alpha = jnp.asarray(alpha)
    shape = [1] * ndim
    shape[channel_axis] = alpha.shape[0] if alpha.ndim else 1
    return alpha.reshape(shape)


def _ste(xs: jax.Array, q: jax.Array) -> jax.Array:
    """Straight-through: forward value q, gradient of identity around xs."""
    return xs + jax.lax.stop_gradient(q - xs)


def ant_fake_quant(x: jax.Array, grid: jax.Array, alpha: jax.Array,
                   channel_axis: int | None = None,
                   static_bit: int | None = None,
                   dyn_bit=None) -> jax.Array:
    """ANT fake quantization (quant_modules.py:535-551).

    ``static_bit``/``dyn_bit``: the site's configured bit (trace-time) and
    the state's possibly-promoted bit (runtime) — see _snap_sized."""
    a = expand_alpha(alpha, x.ndim, channel_axis)
    scale = a / jnp.max(grid)
    xs = x / scale
    q = _snap_sized(xs, grid, static_bit, dyn_bit)
    return _ste(xs, q) * scale


def olive_fake_quant(x: jax.Array, grid: jax.Array, outliers: jax.Array | None,
                     alpha: jax.Array, channel_axis: int | None = None,
                     pair_axis: int = -1, static_bit: int | None = None,
                     dyn_bit=None) -> jax.Array:
    """OliVe fake quantization with OVP (olive quant_modules.py:294-330).

    ``outliers=None`` reproduces the --no_outlier path (plain ANT-style
    snap on the normal grid). Note scale uses max of the *normal* grid
    only. The outlier grid holds 2^bit real entries (olive
    quant_modules.py:304: cat of two 2^bit grids), so the concat snap is
    sliced to its static 2^(bit+1) size; states promoted past 6 bits at
    runtime take the full padded-concat scan (rare — only the
    set_8_bit_layer_n sites of a PTQ eval)."""
    a = expand_alpha(alpha, x.ndim, channel_axis)
    scale = a / jnp.max(grid)
    xs = x / scale
    if outliers is None:
        q = _snap_sized(xs, grid, static_bit, dyn_bit)
    else:
        def small(v):
            n = 2 ** static_bit
            full = jnp.concatenate([grid[:n],
                                    outliers[:n].astype(grid.dtype)])
            qq = snap_concat_value(v, full)
            return apply_ovp(qq, pair_axis=pair_axis)

        def big(v):
            full = jnp.concatenate([grid, outliers.astype(grid.dtype)])
            qq = snap_concat_value(v, full)
            return apply_ovp(qq, pair_axis=pair_axis)

        if static_bit is None:
            q = big(xs)
        elif static_bit > 6:
            q = big(xs)
        else:
            q = jax.lax.cond(dyn_bit > 6, big, small, xs)
    return _ste(xs, q) * scale
