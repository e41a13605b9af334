"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no pipeline parallelism (SURVEY.md §2.8). TPU-native
design: layer stacks are already (L, ...) arrays (the engine/scan layout),
so a pipeline stage is a *shard of the layer axis* — put the 'pp' mesh
axis on axis 0 of every stacked parameter and each device holds L/P
contiguous layers. Activations flow between neighbor stages with
``jax.lax.ppermute`` (ICI neighbor hops), microbatches fill the pipeline
GPipe-style: with M microbatches and P stages the schedule runs M + P - 1
ticks, stage p working on microbatch t - p at tick t. Bubble fraction =
(P-1)/(M+P-1), the standard GPipe overhead.

``gpipe`` is generic over the stage body: any ``fn(stage_params, x) -> x``
with shape-preserving x (a transformer block stack qualifies).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gpipe", "stack_spec", "shard_stage_params"]


def stack_spec() -> P:
    """PartitionSpec for (L, ...) stacked layer params: stage = layer
    shard."""
    return P("pp")


def shard_stage_params(params, mesh: Mesh):
    """Place a pytree of (L, ...) stacked arrays with the layer axis
    sharded over 'pp'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(("pp",) + (None,) * (x.ndim - 1))))),
        params)


def gpipe(stage_fn: Callable, mesh: Mesh, axis: str = "pp"):
    """Build a pipelined apply: (stacked_params, x_microbatched) -> y.

    stage_fn(stage_params, x) applies one device's layer shard to one
    microbatch (x and y same shape). ``x_microbatched`` has shape
    (M, ...) — M microbatches; returns (M, ...) outputs having passed
    through ALL stages in order.
    """
    P_ = mesh.shape[axis]

    def pipelined(params_local, x_mb):
        M = x_mb.shape[0]
        stage = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(x_mb[0])
        out = jnp.zeros_like(x_mb)

        def tick(carry, t):
            buf, out = carry
            # stage 0 ingests microbatch t (when in range)
            mb_idx = jnp.clip(t, 0, M - 1)
            fresh = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, 0,
                                                 keepdims=False)
            cur = jnp.where(stage == 0, fresh, buf)
            # my microbatch at this tick is t - stage; compute when valid
            my_mb = t - stage
            active = (my_mb >= 0) & (my_mb < M)
            y = stage_fn(params_local, cur)
            y = jnp.where(active, y, cur)
            # last stage writes its finished microbatch
            write_idx = jnp.clip(my_mb, 0, M - 1)
            do_write = active & (stage == P_ - 1)
            upd = jnp.where(do_write, y,
                            jax.lax.dynamic_index_in_dim(out, write_idx, 0,
                                                         keepdims=False))
            out = jax.lax.dynamic_update_index_in_dim(out, upd, write_idx,
                                                      0)
            # rotate activations to the next stage (ring; stage P-1 ->
            # stage 0 wraps, ignored because stage 0 reads fresh input)
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % P_) for i in range(P_)])
            return (buf, out), ()

        (buf, out), _ = jax.lax.scan(tick, (buf, out),
                                     jnp.arange(M + P_ - 1))
        # only the last stage holds finished outputs; replicate them to
        # every stage (psum of a one-hot-masked buffer = broadcast)
        out = jax.lax.psum(
            jnp.where(stage == P_ - 1, out, jnp.zeros_like(out)), axis)
        return out

    def apply(params_sharded, x):
        sm = shard_map(
            pipelined, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(
                lambda l: P(*(("pp",) + (None,) * (l.ndim - 1))),
                params_sharded), P()),
            out_specs=P(),
            check_vma=False)
        return sm(params_sharded, x)

    return apply
