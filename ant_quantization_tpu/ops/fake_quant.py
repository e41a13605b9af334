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

from .snap import snap, snap_concat
from .ovp import apply_ovp

__all__ = ["ant_fake_quant", "olive_fake_quant", "expand_alpha"]


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
                   channel_axis: int | None = None) -> jax.Array:
    """ANT fake quantization (quant_modules.py:535-551)."""
    a = expand_alpha(alpha, x.ndim, channel_axis)
    scale = a / jnp.max(grid)
    xs = x / scale
    q, _ = snap(xs, grid)
    return _ste(xs, q) * scale


def olive_fake_quant(x: jax.Array, grid: jax.Array, outliers: jax.Array | None,
                     alpha: jax.Array, channel_axis: int | None = None,
                     pair_axis: int = -1) -> jax.Array:
    """OliVe fake quantization with OVP (olive quant_modules.py:294-330).

    ``outliers=None`` reproduces the --no_outlier path (plain ANT-style
    snap on the normal grid). Note scale uses max of the *normal* grid only.
    """
    a = expand_alpha(alpha, x.ndim, channel_axis)
    scale = a / jnp.max(grid)
    xs = x / scale
    if outliers is None:
        q, _ = snap(xs, grid)
    else:
        full = jnp.concatenate([grid, outliers.astype(grid.dtype)])
        q, _ = snap_concat(xs, full)
        q = apply_ovp(q, pair_axis=pair_axis)
    return _ste(xs, q) * scale
