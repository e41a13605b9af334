"""Collective matmuls: comm/compute-overlapped all-gather and
reduce-scatter fused with the matmul (the scaling-book "collective
matmul" pattern).

The naive tensor-parallel schedule serializes communication and compute:
all-gather the sequence-sharded activations, then matmul; or matmul, then
reduce-scatter the partials. The ring-chunked form interleaves them —
at every ring step one activation chunk is multiplied while the next is
in flight on ICI (`lax.ppermute`), so the collective's latency hides
behind the MXU. XLA's async collective scheduling overlaps the ppermute
with the dot inside the `lax.fori_loop` body; on a real slice this
recovers most of the all-gather time for K x N large enough to keep the
MXU busy one hop.

``ring_allgather_matmul`` is the column-parallel entry (sequence-sharded
x, output-sharded W), ``matmul_reducescatter`` the row-parallel exit
(input-sharded W, partial sums scattered back to sequence shards).

The ``*_i8`` variants are the QUANTIZED rings the serving engine's
sequence-parallel prefill path uses (serve/engine.py:forward, sp branch):
the activation is snapped to its int8 codebook domain *before* the ring,
so the all-gather ring carries **int8 codes — 4x less ICI traffic than
f32** — and every ring step is an int8 x int8 MXU dot accumulating in
int32; the reduce-scatter ring carries int32 partial sums (exact — no
precision loss from the ring order). The f32 forms remain for the bf16
baseline. Correctness of all four is validated against the unfused
all_gather/psum_scatter forms on the virtual CPU mesh
(tests/test_collective_matmul.py), and the sharded engine's sp path is
asserted logits-equal to the single-device engine
(tests/test_sharded_engine.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_allgather_matmul", "matmul_reducescatter",
           "ring_allgather_matmul_i8", "matmul_reducescatter_i8"]


def ring_allgather_matmul(x_local: jax.Array, w: jax.Array,
                          axis_name: str) -> jax.Array:
    """(gathered x) @ w without materializing the gather.

    x_local: (M_loc, K) — this device's shard of a (P*M_loc, K) activation
    w:       (K, N_loc) — this device's weight shard (column parallel)
    returns  (P*M_loc, N_loc): the FULL sequence against local columns.

    Ring schedule: at step s, multiply the chunk that originated at
    device (i + s) mod P while ppermuting it onward; every chunk visits
    every device in P-1 hops.
    """
    P = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    M_loc = x_local.shape[0]
    N = w.shape[1]
    out = jnp.zeros((P * M_loc, N), x_local.dtype)
    perm = [(d, (d - 1) % P) for d in range(P)]   # chunks flow "backward"

    def step(s, carry):
        chunk, out = carry
        # chunk currently held originated at device (i + s) mod P
        src = (i + s) % P
        y = jnp.dot(chunk, w, preferred_element_type=jnp.float32)
        out = jax.lax.dynamic_update_slice(
            out, y.astype(out.dtype), (src * M_loc, 0))
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return chunk, out

    chunk, out = jax.lax.fori_loop(0, P, step, (x_local, out))
    return out


def matmul_reducescatter(x: jax.Array, w_local: jax.Array,
                         axis_name: str) -> jax.Array:
    """Row-parallel matmul with the psum fused into a ring
    reduce-scatter.

    x:       (M, K_loc) — full rows, this device's slice of the K dim
    w_local: (K_loc, N) — this device's weight rows
    returns  (M_loc, N) with M_loc = M / P: this device's shard of
             psum_over_devices(x @ w_local), scattered along M.

    Ring schedule: the accumulator for shard d travels the ring; each
    device adds its partial product for the rows it is responsible for
    while the previous partial is in flight.
    """
    P = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    M = x.shape[0]
    assert M % 1 == 0
    M_loc = M // P
    N = w_local.shape[1]
    perm = [(d, (d + 1) % P) for d in range(P)]

    def partial_for(shard, acc):
        rows = jax.lax.dynamic_slice(
            x, (shard * M_loc, 0), (M_loc, x.shape[1]))
        return acc + jnp.dot(rows, w_local,
                             preferred_element_type=jnp.float32)

    def step(s, acc):
        # after s hops the accumulator I hold belongs to shard
        # (i + (P-1) - s) mod P; add my contribution, pass it on
        shard = (i + (P - 1) - s) % P
        acc = partial_for(shard, acc)
        return jax.lax.cond(
            s < P - 1,
            lambda a: jax.lax.ppermute(a, axis_name, perm),
            lambda a: a, acc)

    acc = jnp.zeros((M_loc, N), jnp.float32)
    acc = jax.lax.fori_loop(0, P, step, acc)
    return acc


def _ovp_local_dot(chunk: jax.Array, w_i8: jax.Array, w_clip,
                   a_ovp: bool):
    """Local dot of one ring hop with OVP decode folded in.

    Sign-offset OVP codes decode LINEARLY: value(c) = 16c - 15*clip(c)
    (kernels/qmatmul.py OVP section), so an OVP operand costs one extra
    int8 MXU dot, not a decode pass. ``chunk`` may be OVP activation
    codes (a_ovp: clip computed locally — the ring still carries ONE
    int8 stream), ``w_clip`` is the precomputed clip of OVP weights
    (loop-invariant, hoisted out of the ring). Plain x plain returns the
    int32 dot; any OVP form returns the f32 combine — the same
    accumulation class as the reference's f32 matmul (and the aovp
    stacked kernel, kernels/stacked.py:_aovp_kernel)."""
    dims = (((1,), (0,)), ((), ()))

    def d(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.int32)

    if not a_ovp and w_clip is None:
        return d(chunk, w_i8)
    if not a_ovp:
        return (16.0 * d(chunk, w_i8).astype(jnp.float32)
                - 15.0 * d(chunk, w_clip).astype(jnp.float32))
    px = jnp.clip(chunk.astype(jnp.int32), -64, 64).astype(jnp.int8)
    if w_clip is None:
        return (16.0 * d(chunk, w_i8).astype(jnp.float32)
                - 15.0 * d(px, w_i8).astype(jnp.float32))
    return (256.0 * d(chunk, w_i8).astype(jnp.float32)
            - 240.0 * d(chunk, w_clip).astype(jnp.float32)
            - 240.0 * d(px, w_i8).astype(jnp.float32)
            + 225.0 * d(px, w_clip).astype(jnp.float32))


def ring_allgather_matmul_i8(xq_local: jax.Array, w_i8: jax.Array,
                             axis_name: str, w_ovp: bool = False,
                             a_ovp: bool = False) -> jax.Array:
    """Quantized column-parallel ring: int8 codes travel the ring.

    xq_local: (M_loc, K) int8 — this device's activation shard, already
              snapped to the shared int8 codebook domain (the snap is
              per-tensor, so every device snaps identically); OVP
              activation sites pass sign-offset codes with a_ovp=True
    w_i8:     (K, N_loc) int8 codebook-value weights (engine "w4"
              layout), or sign-offset OVP codes with w_ovp=True
    returns   (P*M_loc, N_loc) int32 (plain) / f32 (any OVP: the
              16/-15 decode combine) — caller applies
              (a_scale * oscale) and the bias.

    OVP forms keep the ring traffic at ONE int8 stream: the weight clip
    is loop-invariant and the activation clip derives locally from the
    codes in flight. Each output row-block is produced by full-K dots in
    a single hop, so the result is bit-identical to the single-device
    dual/quad-dot path.
    """
    P = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    M_loc = xq_local.shape[0]
    N = w_i8.shape[1]
    any_ovp = w_ovp or a_ovp
    w_clip = (jnp.clip(w_i8.astype(jnp.int32), -64, 64).astype(jnp.int8)
              if w_ovp else None)
    out = jnp.zeros((P * M_loc, N),
                    jnp.float32 if any_ovp else jnp.int32)
    perm = [(d, (d - 1) % P) for d in range(P)]

    def step(s, carry):
        chunk, out = carry
        src = (i + s) % P
        y = _ovp_local_dot(chunk, w_i8, w_clip, a_ovp)
        out = jax.lax.dynamic_update_slice(out, y.astype(out.dtype),
                                           (src * M_loc, 0))
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return chunk, out

    _, out = jax.lax.fori_loop(0, P, step, (xq_local, out))
    return out


def matmul_reducescatter_i8(xq: jax.Array, w_i8_local: jax.Array,
                            axis_name: str, w_ovp: bool = False,
                            a_ovp: bool = False) -> jax.Array:
    """Quantized row-parallel ring: partial sums travel the ring.

    xq:         (M, K_loc) int8 — full rows snapped to the codebook
                domain of THIS device's K slice (per-tensor scale);
                sign-offset OVP codes with a_ovp=True
    w_i8_local: (K_loc, N) int8 codebook-value weight rows (sign-offset
                OVP codes with w_ovp=True)
    returns     (M_loc, N): this device's M shard of the summed product.
                Plain sites: int32 — exact, no float reduction-order
                effects. OVP sites: f32 (the per-hop 16/-15 decode
                combine rides the ring; same bytes as int32, same
                accumulation class as the reference's f32 matmul).
                Caller applies (a_scale * oscale) + bias.
    """
    P = jax.lax.psum(1, axis_name)
    i = jax.lax.axis_index(axis_name)
    M = xq.shape[0]
    M_loc = M // P
    N = w_i8_local.shape[1]
    any_ovp = w_ovp or a_ovp
    w_clip = (jnp.clip(w_i8_local.astype(jnp.int32), -64, 64)
              .astype(jnp.int8) if w_ovp else None)
    perm = [(d, (d + 1) % P) for d in range(P)]

    def partial_for(shard, acc):
        rows = jax.lax.dynamic_slice(
            xq, (shard * M_loc, 0), (M_loc, xq.shape[1]))
        return acc + _ovp_local_dot(rows, w_i8_local, w_clip,
                                    a_ovp).astype(acc.dtype)

    def step(s, acc):
        shard = (i + (P - 1) - s) % P
        acc = partial_for(shard, acc)
        return jax.lax.cond(
            s < P - 1,
            lambda a: jax.lax.ppermute(a, axis_name, perm),
            lambda a: a, acc)

    acc = jnp.zeros((M_loc, N), jnp.float32 if any_ovp else jnp.int32)
    return jax.lax.fori_loop(0, P, step, acc)
