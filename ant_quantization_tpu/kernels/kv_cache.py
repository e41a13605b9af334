"""INT8 KV-cache storage ops.

The serving engine stores K/V as int8 codes with per-(batch, head,
position) scales: 2x less HBM than bf16, 4x less than f32. Quantization is
symmetric absmax over the head dim (the standard KV-cache INT8 recipe).

Layout: codes are stored **(B, H, S/f, f·D)** with the lane-fold factor
``f = 128 // head_dim`` (1 when head_dim >= 128): ``f`` consecutive
positions share one 128-lane row, so the int8 array is stored UNPADDED.
XLA:TPU pads the minormost dim of an int8 array to the 128-lane tile — a
(S, 64) per-head cache would occupy (and stream) 2x its bytes, and
feeding it to the Pallas attention kernel repacks the whole cache every
step (measured 3.8 ms/step at GPT2-XL geometry, r4 trace). Folding makes
D < 128 head dims (GPT-2/BERT: 64) stream at full rate; position ``p``
lives at row ``p // f``, lanes ``[(p % f)·D, (p % f + 1)·D)``. Scales
are stored plane-major **(B, H, f, S/f)** for every int8 cache —
including f = 1, where that is (B, H, 1, S): the attention kernel blocks
scales with trailing dims (f, S/f), and reshaping a flat (.., H, S)
stack into that shape per layer call is not layout-preserving on TPU
(the degenerate second-minor dim becomes the sublane dim), so storing
kernel-native avoids a full-stack relayout every decode step (r5 fix of
the r4 advisor finding).

The (S/f, f·D) row block a single head's attention reads stays
contiguous and tile-aligned, streamed per (b, h) grid step by the fused
kernel (kernels/attention.py), which slices the f position-planes per
lane group in-register.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["QuantKV", "kv_fold", "init_kv", "append_kv",
           "append_kv_stacked", "dequant_kv"]


class QuantKV(NamedTuple):
    k: jax.Array        # (B, H, S/f, f*D) int8 (or (B, H, S, D) bf16/f32)
    v: jax.Array        # like k
    k_scale: jax.Array  # (B, H, f, S/f) f32 PLANE-MAJOR (f = 1 included:
    v_scale: jax.Array  # (B, H, 1, S)) so the attention kernel blocks
                        # them directly with no per-layer reshape
                        # (position p -> [p % f, p // f])


def kv_fold(head_dim: int, max_len: int) -> int:
    """Lane-fold factor for int8 code storage (see module docstring).

    Capped at 4 (head_dim >= 32): production head dims are 64/128, and
    the fold costs f statically-unrolled score planes in the attention
    kernel plus f write branches in the folded append — at the f = 16 a
    toy head_dim 8 would pick, that graph bloat swamps any bandwidth win
    (and interpret-mode tests most of all) while 16-lane rows would still
    pad 8x anyway.

    ``max_len`` need not divide f: :func:`init_kv` rounds the allocated
    length up to a fold multiple (the attention mask covers the tail), so
    an odd max_seq never silently falls back to the flat layout's 2x
    lane padding (r4 advisor finding)."""
    del max_len
    if head_dim >= 128 or 128 % head_dim or head_dim < 32:
        return 1
    return 128 // head_dim


def init_kv(batch: int, max_len: int, n_heads: int, head_dim: int,
            fold: Optional[int] = None) -> QuantKV:
    """``fold=1`` forces the flat (B, H, S, D) code layout (bf16 baseline
    caches and the unfused per-layer kernel use it). The allocated length
    is ``max_len`` rounded up to a fold multiple; scales are always
    plane-major (B, H, f, S/f)."""
    f = kv_fold(head_dim, max_len) if fold is None else fold
    S = -(-max_len // f) * f
    z8 = jnp.zeros((batch, n_heads, S // f, f * head_dim), jnp.int8)
    zs = jnp.zeros((batch, n_heads, f, S // f), jnp.float32)
    return QuantKV(z8, z8, zs, zs)


def _quantize(x: jax.Array):
    """(..., D) -> int8 codes + scale over the last dim."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


def _put_at(buf: jax.Array, upd: jax.Array, prefix: tuple, idx,
            f: int, D: int):
    """One positional write of ``upd`` (.., H, T, D) rows into the
    (possibly lane-folded) code buffer at positions ``idx..idx+T-1``.
    ``prefix`` is the leading start indices (layer and/or batch)."""
    zeros = (0,) * (buf.ndim - len(prefix) - 2)
    T = upd.shape[-2]
    if f == 1:
        return jax.lax.dynamic_update_slice(buf, upd,
                                            prefix + zeros + (idx, 0))
    if T == 1:
        return jax.lax.dynamic_update_slice(
            buf, upd, prefix + zeros + (idx // f, (idx % f) * D))

    # T > 1 at a dynamic start: position idx+t with t ≡ (r - idx) mod f
    # lands in lane-plane r as a stride-f slice of upd. The plane strides
    # must be static, so branch on idx % f (f is tiny).
    def mk(r0):
        def branch(b_):
            out = b_
            for r in range(f):
                tsel = (r - r0) % f
                sub = upd[..., tsel::f, :]
                if sub.shape[-2] == 0:
                    continue
                out = jax.lax.dynamic_update_slice(
                    out, sub,
                    prefix + zeros + ((idx + tsel) // f, r * D))
            return out
        return branch

    def full_rows(b_):
        # idx % f == 0 and f | T: the T positions fill WHOLE folded rows,
        # and (.., S/f, f*D) row-major IS position order — the write is a
        # reshape + ONE contiguous lane-aligned dynamic_update_slice. The
        # strided branches below update at lane offset r*D (not 128-
        # aligned), which XLA lowers to masked copies: an r5 trace of the
        # GPT2-XL prefill (f=2, T=512) showed those + their operand
        # copies dominating the whole forward (~60 ms of a 125 ms step).
        return jax.lax.dynamic_update_slice(
            b_, upd.reshape(upd.shape[:-2] + (T // f, f * D)),
            prefix + zeros + (idx // f, 0))

    branches = [full_rows if r0 == 0 and T % f == 0 else mk(r0)
                for r0 in range(f)]
    return jax.lax.switch(idx % f, branches, buf)


def _put_codes(buf: jax.Array, val: jax.Array, index, layer=None):
    """Write (B, H, T, D) values into a (possibly folded) code buffer at
    positions ``index..index+T-1`` (scalar index) or per-sequence
    positions (vector index); ``layer`` indexes a leading L dim (the
    stacked cache). All writes are small in-place dynamic_update_slices
    on the scan carry."""
    B, H, T, D = val.shape
    f = buf.shape[-1] // D
    lpre = () if layer is None else (jnp.asarray(layer, jnp.int32),)
    lift = (lambda x: x) if layer is None else (lambda x: x[None])
    index = jnp.asarray(index)
    if index.ndim:                                 # (B,) per-sequence
        out = buf
        for b in range(B):                         # B small and static
            out = _put_at(out, lift(val[b:b + 1]).astype(buf.dtype),
                          lpre + (b,), index[b], f, D)
        return out
    return _put_at(buf, lift(val).astype(buf.dtype), lpre, index, f, D)


def _put_scale_at(buf: jax.Array, upd: jax.Array, prefix: tuple, idx,
                  f: int):
    """One positional write of ``upd`` (.., H, T) scales into a
    plane-major (.., H, f, S/f) scale buffer (f = 1: (.., H, 1, S))."""
    T = upd.shape[-1]
    zeros = (0,) * (buf.ndim - len(prefix) - 2)
    if T == 1:
        # Decode hot path. A (.., H, 1, 1) DUS update writes ONE f32 lane
        # per (b, h) tile row — B*H scattered masked element writes,
        # measured 13 us/layer on v5e (the codes' contiguous 128-lane row
        # updates take 2.6 us). Instead: read the layer's full (f, S/f)
        # scale rows, select the new scalar in at [idx % f, idx // f],
        # and write whole rows back — the DUS update is lane-aligned, the
        # extra ~0.6 MB/layer of streamed rows costs ~1 us, and XLA keeps
        # the buffer in place on the scan carry.
        start = prefix + zeros + (0, 0)
        sizes = ((1,) * len(prefix) + buf.shape[len(prefix):-2]
                 + buf.shape[-2:])
        rows = jax.lax.dynamic_slice(buf, start, sizes)
        fdim, s2 = buf.shape[-2:]
        mask = ((jnp.arange(fdim)[:, None] == idx % fdim)
                & (jnp.arange(s2)[None, :] == idx // fdim))
        newv = upd[..., 0][..., None, None].astype(buf.dtype)
        return jax.lax.dynamic_update_slice(
            buf, jnp.where(mask, newv, rows), start)
    if f == 1:
        return jax.lax.dynamic_update_slice(buf, upd[..., None, :],
                                            prefix + zeros + (0, idx))

    def mk(r0):
        def branch(b_):
            out = b_
            for r in range(f):
                tsel = (r - r0) % f
                sub = upd[..., tsel::f]
                if sub.shape[-1] == 0:
                    continue
                out = jax.lax.dynamic_update_slice(
                    out, sub[..., None, :],
                    prefix + zeros + (r, (idx + tsel) // f))
            return out
        return branch

    def full_rows(b_):
        # aligned whole-row fill (see _put_at.full_rows): position p goes
        # to plane p % f, row p // f — a (T/f, f) reshape + transpose of
        # the small scale vector, then one contiguous DUS
        planes = upd.reshape(upd.shape[:-1] + (T // f, f))
        planes = jnp.swapaxes(planes, -1, -2)
        return jax.lax.dynamic_update_slice(
            b_, planes, prefix + zeros + (0, idx // f))

    branches = [full_rows if r0 == 0 and T % f == 0 else mk(r0)
                for r0 in range(f)]
    return jax.lax.switch(idx % f, branches, buf)


def _put_scales(buf: jax.Array, val: jax.Array, index, layer=None,
                f: int = 1):
    """Write (B, H, T) scales at position ``index`` (see _put_codes)."""
    B = val.shape[0]
    lpre = () if layer is None else (jnp.asarray(layer, jnp.int32),)
    lift = (lambda x: x) if layer is None else (lambda x: x[None])
    index = jnp.asarray(index)
    val = val.astype(buf.dtype)
    if index.ndim:
        out = buf
        for b in range(B):
            out = _put_scale_at(out, lift(val[b:b + 1]), lpre + (b,),
                                index[b], f)
        return out
    return _put_scale_at(buf, lift(val), lpre, index, f)


def append_kv(cache: QuantKV, k: jax.Array, v: jax.Array,
              index) -> QuantKV:
    """Write new (B, T, H, D) keys/values at position ``index``.

    ``index`` may be a scalar (shared write position — prefill/batched
    decode) or a (B,) vector of per-sequence positions (continuous
    batching, where every slot is at a different fill depth).

    If the cache buffers are int8 the new entries are quantized; otherwise
    they are stored raw (bf16/f32 baseline cache)."""
    k = jnp.transpose(k, (0, 2, 1, 3))   # -> (B, H, T, D), cache layout
    v = jnp.transpose(v, (0, 2, 1, 3))
    if cache.k.dtype == jnp.int8:
        f = cache.k.shape[-1] // k.shape[-1]
        kq, ks = _quantize(k)
        vq, vs = _quantize(v)
        return QuantKV(_put_codes(cache.k, kq, index),
                       _put_codes(cache.v, vq, index),
                       _put_scales(cache.k_scale, ks, index, f=f),
                       _put_scales(cache.v_scale, vs, index, f=f))
    return QuantKV(_put_codes(cache.k, k, index),
                   _put_codes(cache.v, v, index),
                   cache.k_scale, cache.v_scale)


def append_kv_stacked(cache: QuantKV, k: jax.Array, v: jax.Array,
                      layer, index) -> QuantKV:
    """Write new (B, T, H, D) keys/values for ONE layer into the stacked
    (L, B, H, S/f, f*D) cache at position ``index``.

    The layer-scan serving engine keeps the stacked cache in the scan
    *carry* (not xs/ys — that costs two full-layer copies per layer, see
    kernels/attention.py:stacked_int8_kv_attention) and updates it with
    small dynamic_update_slices that XLA performs in place on the loop
    carry. ``index`` may be a scalar (shared write position) or a (B,)
    vector (continuous batching)."""
    k = jnp.transpose(k, (0, 2, 1, 3))   # -> (B, H, T, D), cache layout
    v = jnp.transpose(v, (0, 2, 1, 3))
    if cache.k.dtype == jnp.int8:
        f = cache.k.shape[-1] // k.shape[-1]
        kq, ks = _quantize(k)
        vq, vs = _quantize(v)
        return QuantKV(_put_codes(cache.k, kq, index, layer),
                       _put_codes(cache.v, vq, index, layer),
                       _put_scales(cache.k_scale, ks, index, layer, f),
                       _put_scales(cache.v_scale, vs, index, layer, f))
    return QuantKV(_put_codes(cache.k, k, index, layer),
                   _put_codes(cache.v, v, index, layer),
                   cache.k_scale, cache.v_scale)


def dequant_kv(cache: QuantKV, dtype=jnp.bfloat16):
    """Materializing fallback (tests / prefill einsum path): unfolds the
    lane-packed layout — (.., S/f, f*D) row-major IS position order, so
    the code unfold is a plain reshape; plane-major scales transpose
    back to position order — and applies the scales."""
    ks, vs = cache.k_scale, cache.v_scale
    if ks.ndim == cache.k.ndim:        # folded: plane-major (.., f, S/f)
        flat = lambda s: s.swapaxes(-1, -2).reshape(s.shape[:-2] + (-1,))
        ks, vs = flat(ks), flat(vs)
    S = ks.shape[-1]
    k = cache.k.reshape(cache.k.shape[:-2] + (S, -1)).astype(dtype)
    v = cache.v.reshape(cache.v.shape[:-2] + (S, -1)).astype(dtype)
    return k * ks[..., None].astype(dtype), v * vs[..., None].astype(dtype)
