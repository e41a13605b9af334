"""Stacked-layer fused quantized matmul — the decode-path workhorse.

The serving engine keeps every site's weights for ALL layers in one
stacked array and walks layers with a ``lax.scan``. Feeding XLA's own dot
a per-layer dynamic slice streams int8 at ~400-500 GB/s on v5e, but a
Pallas custom call on that slice forces a materialized copy (~345 GB/s) —
the round-2 blocker for true 4-bit streaming (PERF.md).

This kernel removes the copy: the FULL stacked array is passed to ONE
``pallas_call`` and the layer index arrives as a *scalar-prefetch*
argument consumed by the BlockSpec index_map, so the pipeline DMAs tiles
of layer ``l`` straight out of HBM. Measured on v5e (probes, 2026-08):
8 MB/call streams at ~634 GB/s, 32 MB/call at ~731 GB/s — faster than
XLA's own stacked int8 dot, with the activation snap fused in.

Two storage modes:
  i8  — weights as int8 *codebook values* (kernels/qmatmul.py:
        quantize_weights_w4_i8): K x N int8 per layer, no decode work.
        Measured 22.7 us/layer on a 2048x4096-byte-pair site (739 GB/s).
  p4  — true 4-bit: codes packed two-per-byte in split-K halves
        (qmatmul.py:pack_w4): K/2 x N uint8 per layer. Decode:
        ``affine=True`` (grids whose int8 codebook == code - 8, the
        ANT/OliVe *int* family) is one subtract — measured 17.4 us/layer,
        the fastest path on the chip. The generic select-tree decode for
        arbitrary grids costs 97.7 us/layer (flint sign/mag: 71.5,
        shift-arithmetic: 59.6) — a VPU-bound LUT can't keep up with the
        DMA (11.5 us floor), so non-affine grids should serve as
        mode="i8" (see PERF.md for the measurement table).

Layout notes forced by the axon/v5e backends:
  - the stacked weight is passed **2-D** ``(L*rows, N)`` with the layer
    offset folded into the index_map: 3-D int8 stacks and narrow int8
    activation inputs make XLA pick an exotic entry layout whose
    relayout loops on the remote backend.
  - activations enter as f32 (8-row f32 tiles are natively supported;
    8-row int8 tiles are not) and are snapped/cast in-kernel.
  - per-layer small operands (activation codebook, weight codebook) ride
    as scalar-prefetch SMEM arrays indexed by ``l`` in the kernel body;
    per-layer (1, N)-blocked VMEM operands would violate the TPU
    block-divisibility rule, so the final per-channel scale is applied
    OUTSIDE the kernel (one (M, N) elementwise op, M <= 64).

Numerics are bit-identical to the unfused engine path: the same midpoint
snap (ties to the larger value) on the same pre-scaled values, int8 x
int8 MXU dot, int32 accumulation, one f32 scale at the end.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stacked_quant_matmul", "stacked_quant_matmul_aovp"]


def _snap_int8(xs, aq, g):
    """Midpoint snap of pre-scaled activations onto the int8-domain
    codebook ``aq`` (g scalars from SMEM); ties to the larger value."""
    idx = jnp.zeros(xs.shape, jnp.int32)
    for i in range(g - 1):
        idx += (xs >= (aq[i] + aq[i + 1]) * 0.5).astype(jnp.int32)
    xq = jnp.full(xs.shape, aq[0], jnp.float32)
    for i in range(1, g):
        xq = jnp.where(idx == i, aq[i], xq)
    return xq.astype(jnp.int8)


def _ovp_dual_dot(xq, w_ref, acc_dtype):
    """16*(x@c) - 15*(x@clip(c)) — exact reconstruction of sign-offset
    OVP weights from one int8 stream (kernels/qmatmul.py encoding). The
    only per-element work on the weight stream is the clamp; the TPU
    VPU has no int8 elementwise ALU (even i8 sub/cmp fail to lower), so
    it routes through an i32 roundtrip, SUB-CHUNKED along K to keep the
    4x-wider i32 temporaries inside the scoped-vmem budget. (Measured
    faster than clamping into a full-block int8 scratch: 13.75 vs
    16.0 ms/step at OPT-6.7B 32L; the aovp kernel's 4-dot case prefers
    the scratch, see _aovp_kernel.) Per-sub-chunk int32 is safely
    bounded (16*256*127^2 < 2^27); the CROSS-chunk sum accumulates in
    f32 so adversarial all-outlier columns at K=16384 cannot wrap."""
    dims = (((1,), (0,)), ((), ()))
    bk = w_ref.shape[0]
    sub = min(bk, 256)
    part = None
    for k0 in range(0, bk, sub):
        wc = w_ref[k0:k0 + sub, :]
        xc = xq[:, k0:k0 + sub]
        clip_c = jnp.clip(wc.astype(jnp.int32), -64, 64).astype(jnp.int8)
        p = (16 * jax.lax.dot_general(
                 xc, wc, dims, preferred_element_type=jnp.int32)
             - 15 * jax.lax.dot_general(
                 xc, clip_c, dims, preferred_element_type=jnp.int32)
             ).astype(jnp.float32)
        part = p if part is None else part + p
    return part.astype(jnp.int32) if acc_dtype == jnp.int32 else part


def _i8_kernel(l_ref, aq_ref, x_ref, w_ref, o_ref, acc_ref,
               pw_ref=None, *, n_k: int, g: int, ovp: bool = False):
    """One (M, bn) int32 tile at K-step kc over int8-value weights.

    ``ovp=True``: the weight bytes are the sign-offset OVP encoding
    (kernels/qmatmul.py): |c| <= 64 is a normal value, |c| > 64 an
    abfloat outlier worth sign(c)*(|c|-64)*16 — reconstructed EXACTLY by
    two int8 MXU dots on planes split in-register (the HBM stream stays
    one int8 read; the second dot runs on VMEM-resident data)."""
    kc = pl.program_id(1)
    l = l_ref[0]
    aq = [aq_ref[l, i] for i in range(g)]
    xq = _snap_int8(x_ref[...], aq, g)
    if ovp:
        part = _ovp_dual_dot(xq, w_ref, acc_ref.dtype)
    else:
        part = jax.lax.dot_general(xq, w_ref[...],
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
        o_ref[...] = acc_ref[...]


def _p4_kernel(l_ref, aq_ref, q16_ref, xlo_ref, xhi_ref, w_ref,
               o_ref, acc_ref, *, n_k: int, g: int, affine: bool):
    """One (M, bn) int32 tile at K-step kc over packed-nibble weights.

    The byte at (k, n) holds code(k, n) in the low nibble and
    code(k + K/2, n) in the high nibble; both decode against the
    per-layer 16-entry int8 codebook (scalar-prefetch SMEM, indexed by
    the layer scalar). ``affine=True``: decode is ``code - 8``."""
    kc = pl.program_id(1)
    l = l_ref[0]
    aq = [aq_ref[l, i] for i in range(g)]
    q16 = [q16_ref[l, i] for i in range(16)]

    byte = w_ref[...].astype(jnp.int32)
    lo = byte & 0xF
    hi = (byte >> 4) & 0xF

    def dec(nib):
        if affine:
            return (nib - 8).astype(jnp.int8)
        v = jnp.full(nib.shape, q16[0], jnp.int32)
        for i in range(1, 16):
            v = jnp.where(nib == i, q16[i], v)
        return v.astype(jnp.int8)

    xlo = _snap_int8(xlo_ref[...], aq, g)
    xhi = _snap_int8(xhi_ref[...], aq, g)
    part = jax.lax.dot_general(xlo, dec(lo), (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    part += jax.lax.dot_general(xhi, dec(hi), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)

    @pl.when(kc == 0)
    def _():
        acc_ref[...] = part

    @pl.when(kc > 0)
    def _():
        acc_ref[...] += part

    @pl.when(kc == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...]


def _i8_prefill_kernel(l_ref, aq_ref, x_ref, w_ref, o_ref, acc_ref,
                       xq_ref, *, n_k: int, g: int, ovp: bool, bk: int):
    """M-blocked (prefill-size) variant of _i8_kernel: grid (m, n, k).

    The snap runs IN-kernel: on the first n-pass (j == 0) each (bm, bk)
    activation tile is snapped once into a persistent (bm, K) int8
    scratch; later n-blocks reuse the codes, so the VPU work is exactly
    once per element. The x BlockSpec maps n > 0 to block (m, 0) — an
    unchanged index between consecutive k steps, which the pipeline
    does not re-fetch — so the f32 activations stream once per m row.

    MEASURED RESULT (v5e, OPT-6.7B bs=4 T=512, engine prefill): 240 ms
    vs 120 ms for the XLA path — a 2x LOSS, kept off by default
    (EngineConfig.stacked_prefill). The (m, n, k) grid re-streams the
    full weight stack once per M block (n_m = 16 at bm=128: +15 x
    6.45 GB ~= 140 ms of DMA), which swamps the ~10 ms of standalone
    snap it fuses away; no loop order avoids this, because a
    weight-stationary-over-m schedule needs an (M, bn) accumulator
    (2048 x 2048 f32 = 16 MB) that does not fit next to the other
    buffers in ~16 MB of VMEM. Exact numerics either way; the variant
    only wins when M is small enough that n_m == 1 (a few hundred
    rows), where it matches the decode kernel's economics."""
    j, kc = pl.program_id(1), pl.program_id(2)
    l = l_ref[0]

    @pl.when(j == 0)
    def _():
        aq = [aq_ref[l, i] for i in range(g)]
        xq_ref[:, pl.ds(kc * bk, bk)] = _snap_int8(x_ref[...], aq, g)

    xq = xq_ref[:, pl.ds(kc * bk, bk)]
    if ovp:
        part = _ovp_dual_dot(xq, w_ref, acc_ref.dtype)
    else:
        part = jax.lax.dot_general(xq, w_ref[...],
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
        o_ref[...] = acc_ref[...]


def _aovp_kernel(l_ref, mids_ref, ties_ref, enc_ref, x_ref, w_ref,
                 o_ref, acc_ref, pw_ref=None, *, n_k: int, w_ovp: bool,
                 sub: int):
    """Full-OliVe tile: OVP-encoded ACTIVATIONS x (possibly OVP-encoded)
    weights.

    The activation row arrives pre-scaled to the reference integer
    domain; the kernel snaps it onto the 32-entry grid||outlier concat
    (31 threshold/selects with the unsorted-concat tie rule, boundaries
    and encoded bytes scalar-prefetched per layer), zeroes OVP victims
    (pair logic via lane rolls — parity masks absorb the wrap), and
    encodes straight into sign-offset bytes cx. With x = 16*cx-15*px and
    w = 16*cw-15*pw (p = clip at +-64),

        x @ w = 256*cx@cw - 240*cx@pw - 240*px@cw + 225*px@pw

    — four int8 MXU dots per sub-chunk, each int32-exact (sub=256 rows
    keeps every partial below 2^24), combined into an f32 accumulator:
    the same accumulation class as the fake-quant reference's f32
    matmul. Plain int8-value weights need only the 16/-15 pair."""
    from jax.experimental.pallas import tpu as pltpu
    kc = pl.program_id(1)
    l = l_ref[0]
    xs = x_ref[...]                              # (Mp, bk) f32, v-domain
    Mp, bk = xs.shape

    # snap -> encoded byte value (f32 select chain, 31 boundaries)
    cxf = jnp.full(xs.shape, enc_ref[l, 0], jnp.float32)
    for i in range(mids_ref.shape[1]):
        m = mids_ref[l, i]
        t = ties_ref[l, i]
        take = (xs > m) | ((xs == m) & (t > 0))
        cxf = jnp.where(take, enc_ref[l, i + 1], cxf)

    # OVP victim zeroing on aligned pairs along K: outliers have
    # |byte| > 64 by construction. victim_odd = roll(mask, 1) at odd
    # positions; victim_even = roll(mask & ~victim_odd, -1) at even
    # (olive quant_modules.py:311-320). Lane-roll wraparound lands only
    # on positions the parity masks zero out.
    # roll wants 32-bit lanes (bool rotate unimplemented) and a
    # non-negative shift (-1 == bk-1 mod bk)
    m32 = (jnp.abs(cxf) > 64.0).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (Mp, bk), 1)
    is_odd = (col % 2) == 1
    v_odd = (pltpu.roll(m32, 1, axis=1) == 1) & is_odd
    keep = m32 * (1 - v_odd.astype(jnp.int32))          # mask & ~v_odd
    v_even = (pltpu.roll(keep, bk - 1, axis=1) == 1) & (~is_odd)
    cxf = jnp.where(v_odd | v_even, 0.0, cxf)

    cx = cxf.astype(jnp.int8)
    px = jnp.clip(cxf, -64.0, 64.0).astype(jnp.int8)

    dims = (((1,), (0,)), ((), ()))

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    # NOTE exactness: full-block int32 dots of the byte planes stay
    # below 2^31 (|bytes| <= 127, K-block <= 2048 -> < 3.4e7 per dot);
    # the f32 combine is exact per dot below 2^24 and within 1-ulp-class
    # error beyond — the same accumulation class as the reference's f32
    # matmul the engine is asserted against.
    if w_ovp:
        for k0 in range(0, bk, sub):
            pw_ref[k0:k0 + sub, :] = jnp.clip(
                w_ref[k0:k0 + sub, :].astype(jnp.int32), -64, 64
            ).astype(jnp.int8)
        part = (256.0 * d(cx, w_ref[...]) - 240.0 * d(cx, pw_ref[...])
                - 240.0 * d(px, w_ref[...]) + 225.0 * d(px, pw_ref[...]))
    else:
        part = 16.0 * d(cx, w_ref[...]) - 15.0 * d(px, w_ref[...])

    @pl.when(kc == 0)
    def _():
        acc_ref[...] = part

    @pl.when(kc > 0)
    def _():
        acc_ref[...] += part

    @pl.when(kc == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_layers", "block_n",
                                             "block_k", "w_ovp",
                                             "interpret"))
def stacked_quant_matmul_aovp(l: jax.Array, x: jax.Array, w2d: jax.Array,
                              scales: jax.Array, prescale: jax.Array,
                              mids: jax.Array, ties: jax.Array,
                              enc: jax.Array, *, n_layers: int,
                              block_n: int = 4096, block_k: int = 1024,
                              w_ovp: bool = False,
                              interpret: bool = False) -> jax.Array:
    """Stacked matmul with OVP activations (see _aovp_kernel).

    l:        () int32 layer index
    x:        (M, K) f32 raw activations
    w2d:      (L*K, N) int8 — codebook values, or OVP-encoded (w_ovp)
    scales:   (L, N) f32 output scale (act unit x weight scale, folded)
    prescale: (L,) f32 — alpha / max(normal grid): x/prescale is the
              reference integer domain the concat snap runs in
    mids:     (L, 31) f32 sorted-concat midpoints
    ties:     (L, 31) int32 tie-to-later-in-concat flags
    enc:      (L, 32) f32 encoded byte per sorted concat entry
    Returns (M, N) f32.
    """
    M, K = x.shape
    _, N = w2d.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    assert w2d.shape[0] == n_layers * K
    l = jnp.asarray(l, jnp.int32)
    Mp = max(8, -(-M // 8) * 8)
    sc = jax.lax.dynamic_index_in_dim(prescale, l, 0, keepdims=False)
    xp = jnp.pad(x.astype(jnp.float32) / sc, ((0, Mp - M), (0, 0)))
    bn = _fit(N, block_n)
    bk = _fit(K, block_k)
    n_n, n_k = N // bn, K // bk
    assert bk % 2 == 0, "OVP pairs must not straddle blocks"

    scratch = [pltpu.VMEM((Mp, bn), jnp.float32)]
    if w_ovp:
        scratch.append(pltpu.VMEM((bk, bn), jnp.int8))   # clip(c) plane
    acc = pl.pallas_call(
        functools.partial(_aovp_kernel, n_k=n_k, w_ovp=w_ovp,
                          sub=min(bk, 256)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,     # (l, mids, ties, enc)
            grid=(n_n, n_k),
            in_specs=[
                pl.BlockSpec((Mp, bk), lambda j, c, *_: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn),
                             lambda j, c, l_ref, *_:
                             (l_ref[0] * (K // bk) + c, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mp, bn), lambda j, c, *_: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        interpret=interpret,
    )(l.reshape(1), mids.astype(jnp.float32), ties.astype(jnp.int32),
      enc.astype(jnp.float32), xp, w2d)
    out_scale = jax.lax.dynamic_index_in_dim(
        scales.astype(jnp.float32), l, 0, keepdims=False)
    return acc[:M] * out_scale[None, :]


def _prefill_i8(l, x, w2d, scales, a_q, a_scale, *, n_layers: int,
                block_n: int, block_k: int, block_m: int, ovp: bool,
                interpret: bool) -> jax.Array:
    """M-blocked stacked matmul (see _i8_prefill_kernel). Numerics are
    bit-identical to the decode path: same snap, same int8 MXU dots,
    same int32 (f32 for OVP) accumulation, one f32 scale outside."""
    M, K = x.shape
    _, N = w2d.shape
    bm = block_m
    Mp = -(-M // bm) * bm
    sc = jax.lax.dynamic_index_in_dim(a_scale, l, 0, keepdims=False)
    xp = jnp.pad(x.astype(jnp.float32) / sc, ((0, Mp - M), (0, 0)))
    # cap bn at 2048: the (bm, K) int8 code scratch joins the usual
    # buffers, so bigger N blocks would breach the VMEM budget
    bn = _fit(N, min(block_n, 2048))
    bk = _fit(K, block_k)
    n_m, n_n, n_k = Mp // bm, N // bn, K // bk
    g = int(a_q.shape[1])

    acc_dtype = jnp.float32 if ovp else jnp.int32
    acc = pl.pallas_call(
        functools.partial(_i8_prefill_kernel, n_k=n_k, g=g, ovp=ovp,
                          bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,            # (l, a_q)
            grid=(n_m, n_n, n_k),
            in_specs=[
                # n > 0 reads codes from the scratch, not x: mapping
                # those steps to block (m, 0) keeps the index unchanged
                # between consecutive k steps so the pipeline never
                # re-fetches the f32 activations
                pl.BlockSpec((bm, bk),
                             lambda m, j, c, *_:
                             (m, jnp.where(j > 0, 0, c)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn),
                             lambda m, j, c, l_ref, *_:
                             (l_ref[0] * (K // bk) + c, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda m, j, c, *_: (m, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype),
                            pltpu.VMEM((bm, K), jnp.int8)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), acc_dtype),
        interpret=interpret,
    )(l.reshape(1), a_q.astype(jnp.float32), xp, w2d)
    out_scale = jax.lax.dynamic_index_in_dim(
        scales.astype(jnp.float32), l, 0, keepdims=False)
    return acc[:M].astype(jnp.float32) * out_scale[None, :]


def _fit(n: int, want: int, quantum: int = 128) -> int:
    if n <= want:
        return n
    b = (want // quantum) * quantum
    while b >= quantum:
        if n % b == 0:
            return b
        b -= quantum
    return n


@functools.partial(jax.jit, static_argnames=("mode", "n_layers", "block_n",
                                             "block_k", "block_m",
                                             "affine", "ovp", "interpret"))
def stacked_quant_matmul(l: jax.Array, x: jax.Array, w2d: jax.Array,
                         scales: jax.Array, a_q: jax.Array,
                         a_scale: jax.Array, q16: Optional[jax.Array],
                         *, mode: str, n_layers: int, block_n: int = 2048,
                         block_k: int = 1024, block_m: int = 128,
                         affine: bool = False,
                         ovp: bool = False,
                         interpret: bool = False) -> jax.Array:
    """snap(x / a_scale[l]) @ W[l] * scales[l] for one layer of a stack.

    l:       () int32 layer index (scalar-prefetched)
    x:       (M, K) f32 activations. M <= 256 takes the decode path
             (one M block — the engine's stacked_max_m configs all fit
             here); larger M takes the M-blocked kernel with the snap
             in-kernel (mode "i8" only — see _i8_prefill_kernel and its
             measured-slower caveat)
    w2d:     mode="i8": (L*K, N) int8 codebook values
             mode="p4": (L*K/2, N) uint8 split-K packed nibbles
    scales:  (L, N) f32 — a_scale * per-channel weight scale, folded;
             applied outside the kernel
    a_q:     (L, G) f32 int8-domain activation codebook (G <= 16)
    a_scale: (L, 1) f32 — activation scale (the division happens outside
             the kernel, the exact arithmetic of the unfused path)
    q16:     (L, 16) int32 per-layer weight codebook (p4 only)
    block_m: prefill row-block (128 keeps the worst-case VMEM
             footprint — K=16384 fc_out — near 10 MB of the ~16 MB core
             budget: w 2x2 + acc 1 + out 2x1 + x 2x0.5 + xq 2)
    Returns (M, N) f32.
    """
    M, K = x.shape
    _, N = w2d.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g = int(a_q.shape[1])
    rows = K if mode == "i8" else K // 2
    assert w2d.shape[0] == n_layers * rows, (w2d.shape, n_layers, rows)
    l = jnp.asarray(l, jnp.int32)
    if mode == "i8" and M > 256:
        return _prefill_i8(l, x, w2d, scales, a_q, a_scale,
                           n_layers=n_layers, block_n=block_n,
                           block_k=block_k, block_m=block_m, ovp=ovp,
                           interpret=interpret)
    Mp = max(8, -(-M // 8) * 8)
    # pre-scale outside the kernel (same division as the unfused path)
    sc = jax.lax.dynamic_index_in_dim(a_scale, l, 0, keepdims=False)
    xp = jnp.pad(x.astype(jnp.float32) / sc, ((0, Mp - M), (0, 0)))
    bn = _fit(N, block_n)
    bk = _fit(rows, block_k)
    n_n, n_k = N // bn, rows // bk
    aqf = a_q.astype(jnp.float32)

    if mode == "i8":
        kern = functools.partial(_i8_kernel, n_k=n_k, g=g, ovp=ovp)
        n_prefetch = 2            # (l, a_q)
        in_specs = [
            pl.BlockSpec((Mp, bk), lambda j, c, *_: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn),
                         lambda j, c, l_ref, *_:
                         (l_ref[0] * (rows // bk) + c, j),
                         memory_space=pltpu.VMEM),
        ]
        args = (aqf, xp, w2d)
    else:
        assert q16 is not None
        kern = functools.partial(_p4_kernel, n_k=n_k, g=g, affine=affine)
        n_prefetch = 3            # (l, a_q, q16)
        in_specs = [
            pl.BlockSpec((Mp, bk), lambda j, c, *_: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, bk), lambda j, c, *_: (0, n_k + c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn),
                         lambda j, c, l_ref, *_:
                         (l_ref[0] * (rows // bk) + c, j),
                         memory_space=pltpu.VMEM),
        ]
        # xp (M, K): low half feeds the low nibbles, high half the high
        args = (aqf, q16.astype(jnp.int32), xp, xp, w2d)

    # OVP mode accumulates f32 across K blocks (overflow headroom for
    # adversarial all-outlier columns); plain int8 values stay int32
    acc_dtype = jnp.float32 if (mode == "i8" and ovp) else jnp.int32
    scratch = [pltpu.VMEM((Mp, bn), acc_dtype)]
    acc = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_n, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((Mp, bn), lambda j, c, *_: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), acc_dtype),
        interpret=interpret,
    )(l.reshape(1), *args)
    out_scale = jax.lax.dynamic_index_in_dim(
        scales.astype(jnp.float32), l, 0, keepdims=False)    # (N,)
    return acc[:M].astype(jnp.float32) * out_scale[None, :]
