"""GOBO-style outlier baseline mode ("outlier" in the reference CLIs).

Replicates ant_quantization/antquant/quant_modules.py:417-465: a percentile
threshold splits the tensor; values below it snap on the int grid at
int4-range scale, values above it get 16-bit affine quantization of the
*excess* magnitude between the percentile value and absmax. STE on both
paths. The reference all-reduces both thresholds across DP ranks —
irrelevant under GSPMD where calibration sees the global batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .snap import snap

__all__ = ["outlier_thresholds", "outlier_fake_quant"]


def outlier_thresholds(x: jax.Array, percent: float) -> Tuple[jax.Array,
                                                              jax.Array]:
    """(percentile |x| value, absmax |x|) — quant_modules.py:424-427.
    ``percent`` in [0, 1] (the reference multiplies by 100 for
    np.percentile)."""
    ax = jnp.abs(x).reshape(-1)
    t4 = jnp.percentile(ax, percent * 100.0)
    t16 = ax.max()
    return t4, t16


def outlier_fake_quant(x: jax.Array, grid: jax.Array, t4: jax.Array,
                       t16: jax.Array, percent: float,
                       is_signed: jax.Array) -> jax.Array:
    """Two-level fake quant (quant_modules.py:438-465). ``is_signed`` may
    be a traced bool (the calibrated signedness)."""
    mask16 = jnp.abs(x) > t4

    def int4_path(x):
        scale = t4 / jnp.max(grid)
        q, _ = snap(x / scale, grid)
        return q * scale

    inner = jnp.where(t4 > 0, int4_path(x), x)
    inner = x + jax.lax.stop_gradient(inner - x)   # STE

    if percent >= 1.0:
        return inner

    # 16-bit affine on the excess |x| - t4 (sign restored afterwards)
    level = jnp.where(jnp.asarray(is_signed), 2.0 ** 16 - 1, 2.0 ** 15 - 1)
    scale16 = (t16 - t4) / level
    mag = jnp.abs(x) - t4
    q16 = jnp.round(mag / scale16) * scale16 + t4
    q16 = q16 * jnp.sign(x)
    outer = x + jax.lax.stop_gradient(q16 - x)     # STE
    return jnp.where(mask16, outer, inner)
