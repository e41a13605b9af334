"""Asymmetric affine quantization helpers.

Functional rebuild of the reference's legacy quant_affine.py
(ant_quantization/antquant/quant_affine.py:7-119): linear quantize /
dequantize with affine scale+zero-point, min/max-derived parameters, and a
straight-through-estimator wrapper. The reference keeps these "mostly
unused" next to the codebook path; here they also back the GOBO-style
outlier mode's 16-bit affine region (ops/outlier.py) and are the generic
int-affine utility for anything outside the ANT/OliVe codebooks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["affine_params", "linear_quantize", "linear_dequantize",
           "fake_affine_quantize", "ste_affine_quantize"]


def affine_params(x_min: jax.Array, x_max: jax.Array,
                  bits: int) -> Tuple[jax.Array, jax.Array]:
    """(scale, zero_point) for asymmetric quantization of [x_min, x_max]
    onto [0, 2^bits - 1] (quant_affine.py asymmetric_linear_quantization_
    params semantics: range collapses -> scale 1)."""
    n = 2 ** bits - 1
    rng = x_max - x_min
    scale = jnp.where(rng > 0, n / rng, 1.0)
    zp = scale * x_min
    return scale, zp


def linear_quantize(x: jax.Array, scale: jax.Array, zp: jax.Array,
                    bits: int) -> jax.Array:
    """Round to the integer grid and clamp to [0, 2^bits - 1]."""
    q = jnp.round(scale * x - zp)
    return jnp.clip(q, 0, 2 ** bits - 1)


def linear_dequantize(q: jax.Array, scale: jax.Array,
                      zp: jax.Array) -> jax.Array:
    return (q + zp) / scale


def fake_affine_quantize(x: jax.Array, bits: int,
                         x_min=None, x_max=None) -> jax.Array:
    """Quantize-dequantize through the affine grid (per-tensor unless
    min/max given with broadcastable shapes)."""
    if x_min is None:
        x_min = jnp.min(x)
    if x_max is None:
        x_max = jnp.max(x)
    scale, zp = affine_params(x_min, x_max, bits)
    return linear_dequantize(linear_quantize(x, scale, zp, bits), scale, zp)


@jax.custom_vjp
def ste_affine_quantize(x: jax.Array, bits: int) -> jax.Array:
    """Fake affine quantization with a straight-through gradient (the
    AsymmetricQuantFunction autograd wrapper; the reference leaves backward
    NotImplemented — here it is the standard STE pass-through)."""
    return fake_affine_quantize(x, bits)


def _ste_fwd(x, bits):
    return fake_affine_quantize(x, bits), None


def _ste_bwd(_, g):
    return (g, None)


ste_affine_quantize.defvjp(_ste_fwd, _ste_bwd)
