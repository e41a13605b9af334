"""INT8 KV-cache storage ops.

The serving engine stores K/V as int8 codes with per-(batch, head,
position) scales: 2x less HBM than bf16, 4x less than f32. Quantization is
symmetric absmax over the head dim (the standard KV-cache INT8 recipe).

Layout is **(B, H, S, D)** — head-major, so the (S, D) slice a single
attention head reads is contiguous and tile-aligned (D = TPU lane dim;
S = int8 sublane multiple for real head dims). That is the layout the
fused Pallas attention kernel (kernels/attention.py) streams per (b, h)
grid step in one DMA, and it costs nothing at append time: the incoming
(B, T, H, D) projections are tiny (T = 1 in decode) next to the cache.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["QuantKV", "init_kv", "append_kv", "append_kv_stacked",
           "dequant_kv"]


class QuantKV(NamedTuple):
    k: jax.Array        # (B, H, S, D) int8 (or bf16/f32 baseline)
    v: jax.Array        # (B, H, S, D)
    k_scale: jax.Array  # (B, H, S) f32
    v_scale: jax.Array  # (B, H, S) f32


def init_kv(batch: int, max_len: int, n_heads: int, head_dim: int) -> QuantKV:
    z8 = jnp.zeros((batch, n_heads, max_len, head_dim), jnp.int8)
    zs = jnp.zeros((batch, n_heads, max_len), jnp.float32)
    return QuantKV(z8, z8, zs, zs)


def _quantize(x: jax.Array):
    """(..., D) -> int8 codes + scale over the last dim."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


def append_kv(cache: QuantKV, k: jax.Array, v: jax.Array,
              index) -> QuantKV:
    """Write new (B, T, H, D) keys/values at position ``index``.

    ``index`` may be a scalar (shared write position — prefill/batched
    decode) or a (B,) vector of per-sequence positions (continuous
    batching, where every slot is at a different fill depth).

    If the cache buffers are int8 the new entries are quantized; otherwise
    they are stored raw (bf16/f32 baseline cache)."""
    index = jnp.asarray(index)
    k = jnp.transpose(k, (0, 2, 1, 3))   # -> (B, H, T, D), cache layout
    v = jnp.transpose(v, (0, 2, 1, 3))
    if index.ndim == 0:
        # buffers are (B, H, S, ...): S is axis 2 for codes, 2 for scales
        upd = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype),
            (0, 0, index) + (0,) * (buf.ndim - 3))
    else:
        def upd(buf, val):
            row = lambda b, w, i: jax.lax.dynamic_update_slice(
                b, w.astype(b.dtype), (0, i) + (0,) * (b.ndim - 2))
            return jax.vmap(row)(buf, val, index)
    if cache.k.dtype == jnp.int8:
        kq, ks = _quantize(k)
        vq, vs = _quantize(v)
        return QuantKV(upd(cache.k, kq), upd(cache.v, vq),
                       upd(cache.k_scale, ks), upd(cache.v_scale, vs))
    return QuantKV(upd(cache.k, k), upd(cache.v, v),
                   cache.k_scale, cache.v_scale)


def append_kv_stacked(cache: QuantKV, k: jax.Array, v: jax.Array,
                      layer, index) -> QuantKV:
    """Write new (B, T, H, D) keys/values for ONE layer into the stacked
    (L, B, H, S, D) cache at position ``index``.

    The layer-scan serving engine keeps the stacked cache in the scan
    *carry* (not xs/ys — that costs two full-layer copies per layer, see
    kernels/attention.py:stacked_int8_kv_attention) and updates it with
    small dynamic_update_slices that XLA performs in place on the loop
    carry. ``index`` may be a scalar (shared write position) or a (B,)
    vector (continuous batching)."""
    layer = jnp.asarray(layer, jnp.int32)
    index = jnp.asarray(index)
    k = jnp.transpose(k, (0, 2, 1, 3))   # -> (B, H, T, D), cache layout
    v = jnp.transpose(v, (0, 2, 1, 3))
    B = k.shape[0]
    if index.ndim == 0:
        # buffers are (L, B, H, S, ...): S is axis 3
        upd = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype),
            (layer, 0, 0, index) + (0,) * (buf.ndim - 4))
    else:
        def upd(buf, val):
            # one small in-place DUS per sequence (B is small and static)
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf, val[b:b + 1][None].astype(buf.dtype),
                    (layer, b, 0, index[b]) + (0,) * (buf.ndim - 4))
            return buf
    if cache.k.dtype == jnp.int8:
        kq, ks = _quantize(k)
        vq, vs = _quantize(v)
        return QuantKV(upd(cache.k, kq), upd(cache.v, vq),
                       upd(cache.k_scale, ks), upd(cache.v_scale, vs))
    return QuantKV(upd(cache.k, k), upd(cache.v, v),
                   cache.k_scale, cache.v_scale)


def dequant_kv(cache: QuantKV, dtype=jnp.bfloat16):
    """Materializing fallback (tests / non-Pallas paths): the serving
    engine instead reads the codes directly via kernels/attention.py."""
    k = cache.k.astype(dtype) * cache.k_scale[..., None].astype(dtype)
    v = cache.v.astype(dtype) * cache.v_scale[..., None].astype(dtype)
    return k, v
