"""Fused INT8-KV attention Pallas TPU kernel.

Replaces the dequantize-then-einsum attention read of the serving engine:
the reference (and our previous jnp path) materializes a dequantized copy
of the whole KV cache every step — for INT8 K/V that means reading S·D
int8, writing S·D bf16 and reading it back, i.e. *more* HBM traffic than
an unquantized cache. This kernel streams the int8 codes straight from HBM
into VMEM and dequantizes in-register:

  scores = (q @ k_i8ᵀ) · k_scale        (scale folded after the MXU matmul,
                                         one multiply per (q, s) pair
                                         instead of per (s, d) element)
  out    = (softmax(scores) · v_scale) @ v_i8

so the cache is read exactly once per step at int8 width — the full 2x
bandwidth win of INT8 KV. Causality is positional (rel = k_pos - q_pos
<= 0), which also masks the unwritten tail of the cache, and BLOOM-style
ALiBi biases ride the same rel term (slope per head, 0 = disabled).

Cache layout is (B, H, S, D): the (S, D) trailing block is contiguous and
tile-aligned (D = lane dim 128, S = int8 sublane multiple for real head
dims), so each grid step is one strided DMA with no relayout. Each grid
step processes a *chunk of heads* (`hb` of them, sized to the VMEM budget)
— at decode the per-head work is microscopic (a (1, D)x(D, S) matvec), so
one head per step would be fixed-overhead-bound: measured on v5e, 1 head/
step ran at ~260 us for (B=4, H=32, S=608, D=128) vs ~40 us with head
chunking, against a ~25 us HBM roofline.

K/V for one chunk live in VMEM whole (hb · S · D int8), no flash-style
online softmax needed until S·hb reaches tens of thousands; the wrapper
shrinks hb automatically for long-context prefill.

Parity: tests/test_attention_kernel.py (interpret mode vs a jnp oracle).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_kv_attention", "stacked_int8_kv_attention",
           "attention_oracle"]

_NEG_BIG = float(np.finfo(np.float32).min)


def _kernel(pos_ref, slope_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            *, hb: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    T = q_ref.shape[2]
    S = k_ref.shape[2]
    pos0 = pos_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    rel = col - row - pos0                                   # k_pos - q_pos
    relf = rel.astype(jnp.float32)
    keep = rel <= 0

    for h in range(hb):                                      # static unroll
        q = q_ref[0, h].astype(jnp.float32)                  # (T, D)
        k = k_ref[0, h].astype(jnp.float32)                  # (S, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks_ref[0, h, 0][None, :]
        s = s + slope_ref[0, j * hb + h] * relf              # ALiBi (or 0)
        s = jnp.where(keep, s, _NEG_BIG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs_ref[0, h, 0][None, :]
        o = jax.lax.dot_general(pv, v_ref[0, h].astype(jnp.float32),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


def _head_chunk(H: int, S: int, D: int, T: int,
                budget: int = 6 * 2**20) -> int:
    """Largest divisor of H whose per-step VMEM footprint (double-buffered
    int8 K/V + f32 q/out/scores) fits the budget. 6 MB is measured-best
    at OPT-6.7B decode (hb=16, 2 grid steps/call): a 12 MB budget (hb=32,
    one step) loses the DMA/compute double-buffer overlap — 11.73 vs
    11.65 ms/step, r5)."""
    for hb in range(H, 0, -1):
        if H % hb:
            continue
        per_head = 2 * 2 * S * D + 8 * T * D + 4 * T * S
        if hb * per_head <= budget:
            return hb
    return 1


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def int8_kv_attention(q: jax.Array, k_i8: jax.Array, v_i8: jax.Array,
                      k_scale: jax.Array, v_scale: jax.Array,
                      pos0: jax.Array,
                      slopes: Optional[jax.Array] = None, *,
                      out_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jax.Array:
    """Causal attention of q against an INT8 cache, in one fused kernel.

    q:                (B, H, T, D) float — query-position t is pos0[b] + t
    k_i8, v_i8:       (B, H, S, D) int8 codes
    k_scale, v_scale: (B, H, S) or kernel-native (B, H, 1, S) f32
                      per-position dequant scales
    pos0:             (B,) int32 first query position per sequence
    slopes:           optional (H,) f32 ALiBi slopes
    returns           (B, H, T, D) out_dtype
    """
    B, H, T, D = q.shape
    S = k_i8.shape[2]
    if not interpret and jax.default_backend() == "cpu":
        interpret = True   # compiled Pallas is TPU-only; CPU = tests
    hb = _head_chunk(H, S, D, T)
    qs = q.astype(jnp.float32) * np.float32(1.0 / np.sqrt(D))
    pos = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1),
                           (B,)).reshape(B, 1)
    if slopes is None:
        slopes = jnp.zeros((H,), jnp.float32)
    slopes = slopes.astype(jnp.float32).reshape(1, H)

    return pl.pallas_call(
        functools.partial(_kernel, hb=hb),
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hb, T, D), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, S, D), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, S, D), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, S), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, S), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, T, D), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), out_dtype),
        interpret=interpret,
    )(pos, slopes, qs, k_i8, v_i8,
      k_scale.astype(jnp.float32).reshape(B, H, 1, S),
      v_scale.astype(jnp.float32).reshape(B, H, 1, S))


def _stacked_kernel(l_ref, pos_ref, slope_ref, q_ref, k_ref, v_ref,
                    ks_ref, vs_ref, o_ref, *, hb: int, S2: int, f: int,
                    D: int):
    """Same math as _kernel, but K/V arrive as (1, 1, hb, S/f, f·D)
    blocks cut from the NATIVE stacked lane-folded cache
    (kernels/kv_cache.py) by the layer-aware index_map — the kernel
    never sees the layer dimension. The ``f`` position-planes of a row
    are lane groups ``[r·D, (r+1)·D)`` holding positions ``f·s + r``;
    each plane gets its own score matrix/mask and the softmax combines
    the planes (shared running max + sum), so the math is identical to
    the flat layout. Scales arrive plane-major, (1, 1, hb, f, S/f)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    T = q_ref.shape[2]
    pos0 = pos_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S2), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, S2), 0)

    for h in range(hb):                                      # static unroll
        q = q_ref[0, h].astype(jnp.float32)                  # (T, D)
        kp = k_ref[0, 0, h]                                  # (S2, f*D)
        vp = v_ref[0, 0, h]
        slope = slope_ref[0, j * hb + h]
        planes = []
        for r in range(f):                                   # static unroll
            k = kp[:, r * D:(r + 1) * D].astype(jnp.float32)  # (S2, D)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * ks_ref[0, 0, h, r, :][None, :]
            rel = f * col + r - row - pos0                   # k_pos - q_pos
            s = s + slope * rel.astype(jnp.float32)          # ALiBi (or 0)
            planes.append(jnp.where(rel <= 0, s, _NEG_BIG))
        m = planes[0].max(axis=-1, keepdims=True)
        for s in planes[1:]:
            m = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        l = jnp.zeros_like(m)
        o = jnp.zeros((T, D), jnp.float32)
        for r, s in enumerate(planes):
            p = jnp.exp(s - m)
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            pv = p * vs_ref[0, 0, h, r, :][None, :]
            o = o + jax.lax.dot_general(
                pv, vp[:, r * D:(r + 1) * D].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def stacked_int8_kv_attention(l: jax.Array, q: jax.Array,
                              k: jax.Array, v: jax.Array,
                              k_scale: jax.Array, v_scale: jax.Array,
                              pos0: jax.Array,
                              slopes: Optional[jax.Array] = None, *,
                              out_dtype=jnp.bfloat16,
                              interpret: bool = False) -> jax.Array:
    """Layer-indexed variant of :func:`int8_kv_attention` for the
    layer-``lax.scan`` serving engine.

    Scanning *over* the stacked (L, B, H, S, D) cache costs two ~full-
    layer copies per layer (xs dynamic-slice out + ys update-slice back
    — measured ~3.8 ms/step of a 15.3 ms OPT-6.7B decode step, r4
    profile). Instead the cache stays in the scan **carry** and the
    layer index ``l`` arrives by scalar prefetch consumed by the
    BlockSpec index_map — each grid step DMAs layer l's (hb, S, D) tiles
    straight from HBM, no per-layer slice ever materializes.

    The cache is consumed in its NATIVE 5-D layout with (1, 1, hb, S, D)
    blocks — the block's last two dims equal the array's, which the TPU
    block rule always admits. An earlier revision flattened K/V to
    (L·B·H·S, D): for D < 128 (GPT-2/BERT head_dim 64) that reshape is
    not layout-preserving (int8 lanes pad D to 128), so XLA repacked the
    ENTIRE cache every decode step — measured 3.8 ms/step of relayout at
    GPT2-XL geometry, more than the attention itself.

    l:                () int32 layer index
    q:                (B, H, T, D) float queries
    k, v:             (L, B, H, S/f, f·D) int8 — the stacked cache in the
                      lane-folded layout of kernels/kv_cache.py (f = 1
                      for head_dim >= 128)
    k_scale, v_scale: (L, B, H, S) f32 per-position dequant scales —
                      plane-major (L, B, H, f, S/f) when folded
    pos0:             (B,) int32 first query position per sequence
    slopes:           optional (H,) f32 ALiBi slopes
    returns           (B, H, T, D) out_dtype
    """
    B, H, T, D = q.shape
    L, _, _, S2, Df = k.shape
    f = Df // D
    S = S2 * f
    assert Df == f * D, (k.shape, q.shape)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True   # compiled Pallas is TPU-only; CPU = tests
    hb = _head_chunk(H, S, D, T)
    qs = q.astype(jnp.float32) * np.float32(1.0 / np.sqrt(D))
    pos = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1),
                           (B,)).reshape(B, 1)
    if slopes is None:
        slopes = jnp.zeros((H,), jnp.float32)
    slopes = slopes.astype(jnp.float32).reshape(1, H)

    kv_index = lambda b, j, l_ref: (l_ref[0], b, j, 0, 0)
    # scales ride plane-major, (L, B, H, f, S/f) with (1, 1, hb, f, S/f)
    # blocks: the last two dims equal the array's, so the block rule
    # admits ANY head chunk (a 2-D (hb, S) block would require
    # hb % 8 == 0, rejecting GPT-2's 12/16/20/25-head geometries).
    # Caches STORE scales plane-major for every f (kernels/kv_cache.py)
    # so no reshape happens here on the serving path: reshaping the flat
    # (L, B, H, S) stack per layer call is NOT layout-preserving (the
    # degenerate dim becomes the sublane dim — measured ~1 ms/step of
    # relayout at OPT-6.7B, r4->r5), and transposing folded scales here
    # instead of storing plane-major measured +2.6 ms/step at GPT2-XL.
    # Flat (L, B, H, S) input is still accepted for tests/compat.
    if k_scale.ndim == 5:
        assert k_scale.shape == (L, B, H, f, S2), k_scale.shape
        ks5d = k_scale.astype(jnp.float32)
        vs5d = v_scale.astype(jnp.float32)
    else:
        assert f == 1 and k_scale.shape == (L, B, H, S), k_scale.shape
        ks5d = k_scale.astype(jnp.float32).reshape(L, B, H, 1, S)
        vs5d = v_scale.astype(jnp.float32).reshape(L, B, H, 1, S)

    return pl.pallas_call(
        functools.partial(_stacked_kernel, hb=hb, S2=S2, f=f, D=D),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H // hb),
            in_specs=[
                pl.BlockSpec((B, 1), lambda b, j, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, H), lambda b, j, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, hb, T, D), lambda b, j, *_: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hb, S2, Df), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hb, S2, Df), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hb, f, S2), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hb, f, S2), kv_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, T, D),
                                   lambda b, j, *_: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), out_dtype),
        interpret=interpret,
    )(jnp.asarray(l, jnp.int32).reshape(1), pos, slopes, qs,
      k, v, ks5d, vs5d)


def attention_oracle(q, k_i8, v_i8, k_scale, v_scale, pos0, slopes=None):
    """Plain-jnp f32 oracle with identical semantics (tests)."""
    B, H, T, D = q.shape
    S = k_i8.shape[2]
    k = k_i8.astype(jnp.float32) * k_scale[..., None]
    v = v_i8.astype(jnp.float32) * v_scale[..., None]
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), k)
    s = s / np.sqrt(D)
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32).reshape(-1), (B,))
    q_pos = pos0[:, None] + jnp.arange(T)[None]              # (B, T)
    rel = jnp.arange(S)[None, None] - q_pos[..., None]       # (B, T, S)
    if slopes is not None:
        s = s + slopes[None, :, None, None] * rel[:, None].astype(jnp.float32)
    s = jnp.where((rel <= 0)[:, None], s, _NEG_BIG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)
