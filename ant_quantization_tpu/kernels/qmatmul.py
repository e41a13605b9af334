"""Fused dequantize(W4) + matmul Pallas TPU kernel.

This is the real-quantized serving path that replaces the reference's
fake-quant CUDA extension (quant_kernel.cu): weights live in HBM as packed
4-bit codes (4x less bandwidth than bf16, 8x less than f32) and are decoded
in-register on the VPU while feeding the MXU.

Layout: codes are packed two-per-byte in *split-K halves* —
``packed[i, n]`` holds code(k=i, n) in the low nibble and code(k=i+K/2, n)
in the high nibble. Unpacking therefore never interleaves lanes or
sublanes: the kernel computes ``x_lo @ dequant(lo) + x_hi @ dequant(hi)``.

Decode: ANT grids are arbitrary 16-entry codebooks (flint/pot/float/int),
so dequant is a 16-way select tree over broadcast compares — pure VPU work,
no gathers. The per-output-channel scale multiplies the accumulator once.

The packing helper reproduces the exact fake-quant numerics: packing
``snap_codes(w/scale)`` and dequantizing through this kernel equals the
reference's fake-quant output bit-for-bit (tested in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.snap import snap_codes

__all__ = ["pack_w4", "quantized_matmul_w4", "dequant_w4_reference",
           "int8_codebook", "quantize_weights_w4_i8", "fused_w8a8_matmul",
           "ovp_unit", "quantize_weights_ovp_i8", "ovp_clip",
           "ovp_encode_scalar", "ovp_decode_values", "OVP_OFFSET",
           "OVP_SHIFT"]


def pack_w4(codes: jax.Array) -> jax.Array:
    """(K, N) int codes in [0,16) -> (K//2, N) uint8 split-K packed."""
    K = codes.shape[0]
    assert K % 2 == 0, "K must be even for split-K packing"
    lo = codes[: K // 2].astype(jnp.uint8)
    hi = codes[K // 2:].astype(jnp.uint8)
    return lo | (hi << 4)


def _decode16(nibbles: jax.Array, grid: jax.Array) -> jax.Array:
    """16-way select tree: nibbles (any shape, int) -> grid values (f32).

    ``grid`` is a length-16 trace-time constant or a (16,) array; compares
    are elementwise VPU ops (no gather)."""
    w = jnp.full(nibbles.shape, grid[0], jnp.float32)
    for i in range(1, 16):
        w = jnp.where(nibbles == i, grid[i], w)
    return w


def _qmm_kernel(x_ref, w_ref, scale_ref, grid_ref, o_ref, *, n_k: int):
    """One (bm, bn) output tile at one K-step; accumulates into o_ref.

    x_ref:    (bm, 2, bk2)  activation slice: [:,0,:] pairs the low
                            nibbles, [:,1,:] the high nibbles
    w_ref:    (bk2, bn)     packed bytes for this K-step
    scale_ref:(1, bn)       per-output-channel scale
    grid_ref: (1, 16)       codebook (SMEM, read as scalars)
    o_ref:    (bm, bn)      revisited across the K grid dimension
    """
    kc = pl.program_id(2)
    grid = [grid_ref[0, i] for i in range(16)]

    def decode(nib):
        w = jnp.full(nib.shape, grid[0], jnp.float32)
        for i in range(1, 16):
            w = jnp.where(nib == i, grid[i], w)
        return w

    # widen before bit ops: Mosaic has no uint8 shift lowering
    byte = w_ref[:, :].astype(jnp.int32)
    lo = byte & 0xF
    hi = (byte >> 4) & 0xF
    part = jnp.dot(x_ref[:, 0, :].astype(jnp.float32), decode(lo),
                   preferred_element_type=jnp.float32)
    part += jnp.dot(x_ref[:, 1, :].astype(jnp.float32), decode(hi),
                    preferred_element_type=jnp.float32)

    @pl.when(kc == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    o_ref[:, :] += part

    @pl.when(kc == n_k - 1)
    def _():
        o_ref[:, :] *= scale_ref[0, :][None, :]


def _fit_block(n: int, want: int, quantum: int = 128) -> int:
    """Largest divisor of n that is <= want and a multiple of ``quantum``
    (falling back to n itself for small/odd sizes)."""
    if n <= want:
        return n
    b = (want // quantum) * quantum
    while b >= quantum:
        if n % b == 0:
            return b
        b -= quantum
    return n


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "block_k2", "interpret"))
def quantized_matmul_w4(x: jax.Array, packed: jax.Array, scale: jax.Array,
                        grid: jax.Array, *, block_m: int = 256,
                        block_n: int = 256, block_k2: int = 512,
                        interpret: bool = False) -> jax.Array:
    """x (M, K) @ dequant(packed (K//2, N)) * scale (N,) -> (M, N) f32.

    ``grid`` is the 16-entry integer-domain codebook; ``scale`` is
    alpha/max(grid) per output channel (or a broadcast scalar).
    M is padded up to the tile quantum internally.
    """
    M, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (K, K2)
    scale = jnp.broadcast_to(scale.reshape(-1), (N,)).astype(jnp.float32)
    grid = grid.reshape(1, 16).astype(jnp.float32)

    bm = min(block_m, M)
    if M % bm:
        pad = bm - M % bm
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Mp = x.shape[0]
    bn = _fit_block(N, block_n)
    bk2 = _fit_block(K2, block_k2)
    n_k = K2 // bk2
    # (M, K) -> (M, 2, K2): the two nibble halves become block-contiguous
    x3 = x.reshape(Mp, 2, K2)

    kernel = functools.partial(_qmm_kernel, n_k=n_k)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, 2, bk2), lambda i, j, c: (i, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda i, j, c: (c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, c: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, j, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, c: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        interpret=interpret,
    )(x3, packed, scale.reshape(1, N), grid)
    return out[:M]


def _w8a8_kernel(aq_ref, inv_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                 *, n_k: int, g: int):
    """One (bm, bn) tile at one K step: snap the activation slice onto the
    int8-domain codebook, int8 x int8 MXU matmul, int32 accumulate across
    the K grid, scale once at the last step."""
    kc = pl.program_id(2)
    aq = [aq_ref[0, i] for i in range(g)]
    xs = x_ref[...] * inv_ref[0, 0]          # pre-scaled activations
    idx = jnp.zeros(xs.shape, jnp.int32)
    for i in range(g - 1):
        idx += (xs >= (aq[i] + aq[i + 1]) * 0.5).astype(jnp.int32)
    xq = jnp.full(xs.shape, aq[0], jnp.float32)
    for i in range(1, g):
        xq = jnp.where(idx == i, aq[i], xq)
    part = jax.lax.dot_general(xq.astype(jnp.int8), w_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(kc == 0)
    def _():
        acc_ref[...] = part

    @pl.when(kc > 0)
    def _():
        acc_ref[...] += part

    @pl.when(kc == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * s_ref[0, :][None, :])


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def fused_w8a8_matmul(x: jax.Array, w_i8: jax.Array, a_q: jax.Array,
                      a_scale: jax.Array, out_scale: jax.Array, *,
                      block_n: int = 2048, block_k: int = 2048,
                      interpret: bool = False) -> jax.Array:
    """snap(x / a_scale -> a_q) @ w_i8 * out_scale, one fused kernel.

    W4A4 decode-path matmul for *standalone* weights: weights are the
    exact int8 values of the 16-entry codebook (int8_codebook),
    activations snap onto the int8-domain activation codebook
    in-register, and the product runs on the int8 MXU with int32
    accumulation — one int8-width streaming read of the weights, no
    separate materialized snap pass.

    NOTE (measured on v5e): inside a layer scan over *stacked* (L, K, N)
    weights the engine keeps XLA's own int8 dot instead — XLA feeds a
    dynamic slice to its dot as a view (~500 GB/s) but must materialize a
    copy for a custom call (~345 GB/s). Use this kernel when the weight
    is a real standalone array (~450 GB/s vs ~410 for the unfused dot +
    snap pass at small M).

    x (M, K) f32/bf16; w_i8 (K, N) int8; a_q (G<=16,) sorted int8-domain
    codebook values; a_scale scalar; out_scale (N,) f32 (the folded
    a_scale * per-channel weight scale). Returns (M, N) f32.
    """
    M, K = x.shape
    _, N = w_i8.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g = int(a_q.shape[0])
    assert g <= 16, "fused path is for <=4-bit activation codebooks"
    Mp = -(-M // 8) * 8
    # block M too (prefill: M = batch x seq): weights re-stream once per
    # M block, but at large M the kernel is MXU-bound, not HBM-bound
    bm = min(256, Mp)
    if Mp % bm:
        Mp = -(-Mp // bm) * bm
    xp = jnp.pad(x.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    want = 2048 if bm <= 64 else 1024
    bn = _fit_block(N, min(block_n, want))
    bk = _fit_block(K, min(block_k, want))
    n_m, n_n, n_k = Mp // bm, N // bn, K // bk
    inv = (1.0 / a_scale.astype(jnp.float32)).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k, g=g),
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, g), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret,
    )(a_q.astype(jnp.float32).reshape(1, g), inv, xp, w_i8,
      out_scale.astype(jnp.float32).reshape(1, N))
    return out[:M]


def dequant_w4_reference(packed: jax.Array, scale: jax.Array,
                         grid: jax.Array) -> jax.Array:
    """Plain-jnp oracle: unpack + LUT + scale -> (K, N) f32."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    g = grid.astype(jnp.float32)
    w = jnp.concatenate([g[lo], g[hi]], axis=0)
    return w * jnp.broadcast_to(scale.reshape(-1), (w.shape[1],))[None, :]


def int8_codebook(grid16) -> tuple[np.ndarray, float, bool]:
    """Exact int8 restatement of a 16-entry codebook.

    Every ANT/OliVe 4-bit grid (int/pot/float/flint, quant_modules.py:85-278)
    is, after `convert_tensor`'s max=10.0 normalization, a set of dyadic
    rationals times a common factor — so there is an integer D <= 127 with
    ``grid * D / max|grid|`` exactly integral. Returns ``(q16 int8, unit,
    exact)`` with ``grid[i] == q16[i] * unit`` (unit = vmax/D). The serving
    engine stores weights as ``q16[code]`` int8 *values* — 2x less HBM than
    bf16 and zero per-element decode work, feeding the int8 MXU directly —
    rather than 4-bit indices whose 16-way select-tree decode is VPU-bound.
    Falls back to D=127 rounding (<=0.5% value error) for grids with no
    exact representation.
    """
    g = np.asarray(grid16, np.float64).reshape(-1)
    vmax = float(np.max(np.abs(g)))
    if vmax == 0.0:
        return np.zeros(g.shape, np.int8), 1.0, True
    u = g / vmax
    for d in range(1, 128):
        q = u * d
        if float(np.max(np.abs(q - np.round(q)))) < 1e-6:
            return np.round(q).astype(np.int8), vmax / d, True
    return np.round(u * 127).astype(np.int8), vmax / 127, False


def quantize_weights_w4_i8(w: jax.Array, grid: jax.Array,
                           alpha: jax.Array, axis: int = 1
                           ) -> tuple[jax.Array, jax.Array]:
    """Quantize a (K, N) weight onto a 16-entry grid, storing the int8
    *values* of the grid entries (see int8_codebook); returns
    ``(w_i8 (K, N) int8, scale f32)`` with the dequantized weight
    equal to ``w_i8 * scale`` broadcast along ``axis`` — identical
    numerics to the fake-quant path when the grid is exactly
    int8-representable (always, for 4-bit grids).

    ``axis`` is the per-channel dim: 1 (out, Linear semantics, scale
    (N,)) or 0 (in, GPT-2 Conv1D semantics — olive
    quant_modules.py:358-387 calibrates its (in, out) weight over dim 0;
    scale (K,)).
    """
    g16 = np.asarray(grid).reshape(-1)[:16]
    q16, unit, _ = int8_codebook(g16)
    # reference scale convention: alpha / grid.max() — the SIGNED max
    # (quant_modules.py:537), not absmax; they differ for the asymmetric
    # int grids ([-8..7]-shaped, |min| > max)
    vmax = float(np.max(g16))
    scale = (jnp.broadcast_to(jnp.asarray(alpha).reshape(-1),
                              (w.shape[axis],)) / vmax).astype(jnp.float32)
    sexp = scale[None, :] if axis == 1 else scale[:, None]
    codes = snap_codes(w / sexp, jnp.asarray(g16, jnp.float32))
    # select tree over the 16 static codebook values — no gather (TPU
    # gathers route through the scalar core; see ops/snap.py)
    w_i8 = jnp.full(codes.shape, int(q16[0]), jnp.int8)
    for i in range(1, q16.shape[0]):
        w_i8 = jnp.where(codes == i, np.int8(q16[i]), w_i8)
    return w_i8, scale * np.float32(unit)


# --- exact OVP (outlier-victim pair) int8 serving encoding ---------------
#
# OliVe's abfloat outliers reach 12x the normal grid's max (olive
# quant_modules.py:156-179: magnitudes 48..384 on a 32-normalized grid),
# so OVP-quantized weights are NOT int8 codebook values and the plain
# "w4" storage cannot serve them. The TPU-native encoding exploits two
# facts: (1) there is a unit u with every normal value an integer
# multiple of u bounded by 64, and (2) every abfloat outlier magnitude
# |v|/u of the form 64 + 16*m with integer 1 <= m <= 63 (abfloat
# mantissa steps are power-of-two fractions of power-of-two exponents).
# One int8 byte c per element then carries either kind:
#
#     normal  v:  c = v/u                            (|c| <= OVP_OFFSET)
#     outlier v:  c = sign(v)*(OVP_OFFSET + m),  m = (|v|/u - 64)/16
#
# chosen so the decode is LINEAR in two MXU-dottable byte streams:
#
#     v/u = 16*c - 15*clip(c, -64, 64)
#
# (normals: 16c - 15c = c; outliers: 16*s*(64+m) - 15*s*64 = s*(64+16m))
# so the matmul reconstructs EXACTLY with two int8 MXU dots from the
# single int8 stream (kernels/stacked.py ovp mode):
#
#     x @ W = (16*(x_q @ c) - 15*(x_q @ clip(c))) * (a_scale * oscale)
#
# — exact OliVe OVP serving at int8 HBM bandwidth. The only per-element
# work is the clamp (one i32 roundtrip on TPU, where the VPU has no i8
# elementwise ALU); the second dot runs on VMEM-resident data and is
# MXU-negligible at decode M.

OVP_OFFSET = 64
OVP_SHIFT = 16


def ovp_unit(grid16: np.ndarray, out16: np.ndarray) -> tuple[float, bool]:
    """Largest unit u making the sign-offset OVP encoding exact.

    Conditions: normals/u integral with |.| <= OVP_OFFSET; every outlier
    magnitude |o|/u = 64 + 16*m with integer 1 <= m <= 63. Returns
    (u, exact); u=vmax/127 best-effort when no exact unit exists."""
    g = np.asarray(grid16, np.float64).reshape(-1)
    o = np.asarray(out16, np.float64).reshape(-1)
    vmax = float(np.max(np.abs(g)))
    if vmax == 0.0:
        return 1.0, True
    # zero-padded / absent outlier entries are ordinary (zero) values,
    # not outliers — only magnitudes beyond the normal grid constrain u
    o = o[np.abs(o) > vmax + 1e-9]
    for d in range(1, 128):
        u = vmax / d
        qn = g / u
        ok_n = (np.max(np.abs(qn - np.round(qn))) < 1e-6
                and np.max(np.abs(qn)) <= OVP_OFFSET + 1e-9)
        if not ok_n:
            continue
        if o.size == 0:
            return u, True
        m = (np.abs(o) / u - OVP_OFFSET) / OVP_SHIFT
        if (np.max(np.abs(m - np.round(m))) < 1e-6
                and np.min(m) >= 1 - 1e-9
                and np.max(m) <= 127 - OVP_OFFSET + 1e-9):
            return u, True
    return vmax / 127, False


def quantize_weights_ovp_i8(w: jax.Array, grid: jax.Array,
                            outliers: jax.Array, alpha: jax.Array,
                            pair_axis: int = 0, axis: int = 1
                            ) -> tuple[jax.Array, jax.Array]:
    """OVP-quantize a (K, N) weight (snap onto grid||outliers, zero the
    victims — olive quant_modules.py:294-330) and store it in the
    sign-offset int8 encoding. Returns (w_enc (K, N) int8, scale) with
    the dequantized weight equal to ``ovp_decode_values(w_enc) * scale``
    broadcast along ``axis`` (1 = per-out (N,), Linear; 0 = per-in (K,),
    GPT-2 Conv1D semantics) — exactly the olive fake-quant forward's
    output."""
    from ..ops.ovp import apply_ovp
    from ..ops.snap import snap_concat

    g16 = np.asarray(grid).reshape(-1)[:16]
    o16 = np.asarray(outliers).reshape(-1)[:16]
    u, exact = ovp_unit(g16, o16)
    if not exact:
        raise ValueError(
            "no exact sign-offset OVP unit for this grid/outlier pair — "
            "these weights cannot serve losslessly in 'w4'; use the "
            "fake-quant path or adjust the codebooks")
    vmax = float(np.max(g16))          # reference scale: SIGNED max of
    scale = (jnp.broadcast_to(jnp.asarray(alpha).reshape(-1),  # normals
                              (w.shape[axis],)) / vmax).astype(jnp.float32)
    sexp = scale[None, :] if axis == 1 else scale[:, None]
    full = jnp.concatenate([jnp.asarray(g16, jnp.float32),
                            jnp.asarray(o16, jnp.float32)])
    q, _ = snap_concat(w / sexp, full)
    q = apply_ovp(q, pair_axis=pair_axis)          # victims -> 0
    # integer-domain value -> encoded byte, via a 32-entry select tree
    # over the known codebook values (pack-time only)
    vals = np.unique(np.concatenate([g16, o16, [0.0]]))
    thr = float(np.max(np.abs(g16)))
    w_enc = jnp.zeros(q.shape, jnp.int8)
    for v in vals:
        w_enc = jnp.where(jnp.abs(q - np.float32(v)) < 1e-5 * max(1, abs(v)),
                          np.int8(ovp_encode_scalar(v, u, thr)), w_enc)
    return w_enc, scale * np.float32(u)


def ovp_encode_scalar(v: float, u: float, normal_max: float) -> int:
    """Sign-offset byte for ONE integer-domain value: normals at unit u,
    outliers past +-OVP_OFFSET (see the module section above). The single
    source of the encode formula — used by both the weight packer and the
    engine's activation tables."""
    if abs(v) <= normal_max + 1e-9:
        return int(round(v / u))
    m = int(round((abs(v) / u - OVP_OFFSET) / OVP_SHIFT))
    return int(np.sign(v)) * (OVP_OFFSET + m)


def ovp_clip(c):
    """clip(c, -64, 64) as int8 — the second dot's operand."""
    xp = jnp if isinstance(c, jax.Array) else np
    return xp.clip(c.astype(xp.int32), -OVP_OFFSET,
                   OVP_OFFSET).astype(xp.int8)


def ovp_decode_values(c):
    """Encoded int8 -> integer-domain values (int32):
    16*c - 15*clip(c, -64, 64)."""
    xp = jnp if isinstance(c, jax.Array) else np
    ci = c.astype(xp.int32)
    return OVP_SHIFT * ci - (OVP_SHIFT - 1) * xp.clip(ci, -OVP_OFFSET,
                                                      OVP_OFFSET)


def quantize_weights_w4(w: jax.Array, grid: jax.Array,
                        alpha: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quantize a (K, N) weight onto a 16-entry grid with per-N-channel
    alpha; returns (packed (K//2, N) uint8, scale (N,)).

    scale = alpha / max(grid), codes = snap(w / scale) — identical
    arithmetic to the fake-quant path (quant_modules.py:535-551)."""
    g16 = grid.reshape(-1)[:16]
    scale = (jnp.broadcast_to(alpha.reshape(-1), (w.shape[1],))
             / jnp.max(g16)).astype(jnp.float32)
    codes = snap_codes(w / scale[None, :], g16)
    return pack_w4(codes), scale
