"""Outlier-Victim Pair (OVP) encoding — the OliVe mechanism.

After snapping onto the concatenated normal+outlier grid, every value with
|q| > 32 is an outlier. Values are grouped into aligned 2-element pairs; an
outlier "steals" the encoding space of its pair neighbor (the victim), which
is zeroed. When the even element of a pair is an outlier, the odd element is
the victim; otherwise, when the odd element is an outlier, the even element
is the victim (an outlier that is itself a victim stays zeroed).

Replicates olive_quantization/antquant/quant_modules.py:311-320, where the
masks are built with torch.roll over the row-major-flattened tensor:
  victim_odd  = roll(mask, 1)  zeroed at even indices   -> m_even
  victim_even = roll(mask & ~victim_odd, -1) zeroed at odd -> m_odd & ~m_even

The torch reference pairs elements in the flattened row-major order of an
(out, in) weight, i.e. along the *input* (reduction) dimension. Callers pick
``pair_axis`` accordingly (for a flax (in, out) kernel that is axis 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

OUTLIER_THRESHOLD = 32.0

__all__ = ["OUTLIER_THRESHOLD", "victim_mask", "apply_ovp"]


def victim_mask(outlier_mask: jax.Array, pair_axis: int = -1) -> jax.Array:
    """Boolean mask of victims given the per-element outlier mask.

    ``pair_axis`` must have even length; pairs are (2k, 2k+1) along it.
    """
    m = jnp.moveaxis(outlier_mask, pair_axis, -1)
    n = m.shape[-1]
    assert n % 2 == 0, f"OVP pair axis must be even-length, got {n}"
    mp = m.reshape(*m.shape[:-1], n // 2, 2)
    m_even, m_odd = mp[..., 0], mp[..., 1]
    v_odd = m_even                        # outlier at even kills odd slot
    v_even = m_odd & ~m_even              # else outlier at odd kills even slot
    v = jnp.stack([v_even, v_odd], axis=-1).reshape(m.shape)
    return jnp.moveaxis(v, -1, pair_axis)


def apply_ovp(q: jax.Array, pair_axis: int = -1,
              threshold: float = OUTLIER_THRESHOLD) -> jax.Array:
    """Zero the victims of the snapped (integer-domain) tensor ``q``."""
    victims = victim_mask(jnp.abs(q) > threshold, pair_axis)
    return q * (~victims).astype(q.dtype)
