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

Used with the quantized engine's layouts: ``ring_allgather_matmul`` is
the column-parallel entry (sequence-sharded x, output-sharded W),
``matmul_reducescatter`` the row-parallel exit (input-sharded W, partial
sums scattered back to sequence shards). Correctness is validated against
the unfused all_gather/psum_scatter forms on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_allgather_matmul", "matmul_reducescatter"]


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
