"""Ring collective matmuls vs the unfused all_gather/psum references on
the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ant_quantization_tpu.parallel.collective_matmul import (
    matmul_reducescatter, ring_allgather_matmul)


def _mesh(p):
    return Mesh(np.asarray(jax.devices("cpu")[:p]), ("tp",))


@pytest.mark.parametrize("p", [2, 4, 8])
def test_allgather_matmul_matches_unfused(p):
    rng = np.random.default_rng(0)
    M_loc, K, N = 4, 16, 12           # N per device
    x = jnp.asarray(rng.normal(size=(p * M_loc, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, p * N)), jnp.float32)
    mesh = _mesh(p)

    def fused(x_l, w_l):
        return ring_allgather_matmul(x_l, w_l, "tp")

    got = shard_map(fused, mesh=mesh, in_specs=(P("tp", None),
                                                P(None, "tp")),
                    out_specs=P(None, "tp"), check_vma=False)(x, w)
    want = x @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_matmul_reducescatter_matches_unfused(p):
    rng = np.random.default_rng(1)
    M, K_loc, N = 8 * p, 8, 10
    x = jnp.asarray(rng.normal(size=(M, p * K_loc)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(p * K_loc, N)), jnp.float32)
    mesh = _mesh(p)

    def fused(x_l, w_l):
        return matmul_reducescatter(x_l, w_l, "tp")

    got = shard_map(fused, mesh=mesh,
                    in_specs=(P(None, "tp"), P("tp", None)),
                    out_specs=P("tp", None), check_vma=False)(x, w)
    want = x @ w                       # full product; got is M-sharded
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_roundtrip_column_then_row():
    """Column-parallel in, row-parallel out — a full TP layer with both
    fused collectives equals the dense computation."""
    p = 4
    rng = np.random.default_rng(2)
    M_loc, D, F = 2, 16, 32
    x = jnp.asarray(rng.normal(size=(p * M_loc, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)), jnp.float32)   # col-split
    w2 = jnp.asarray(rng.normal(size=(F, D)), jnp.float32)   # row-split
    mesh = _mesh(p)

    def layer(x_l, w1_l, w2_l):
        h = ring_allgather_matmul(x_l, w1_l, "tp")   # (M, F_loc)
        h = jnp.tanh(h)
        return matmul_reducescatter(h, w2_l, "tp")   # (M_loc, D)

    got = shard_map(layer, mesh=mesh,
                    in_specs=(P("tp", None), P(None, "tp"),
                              P("tp", None)),
                    out_specs=P("tp", None), check_vma=False)(x, w1, w2)
    want = jnp.tanh(x @ w1) @ w2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Quantized rings (the serving engine's sp-prefill collectives)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p", [2, 4, 8])
def test_allgather_matmul_i8_matches_unfused(p):
    from ant_quantization_tpu.parallel.collective_matmul import (
        ring_allgather_matmul_i8)
    rng = np.random.default_rng(3)
    M_loc, K, N = 4, 16, 12
    xq = jnp.asarray(rng.integers(-8, 8, (p * M_loc, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (K, p * N)), jnp.int8)
    mesh = _mesh(p)

    got = shard_map(lambda x_l, w_l: ring_allgather_matmul_i8(x_l, w_l,
                                                              "tp"),
                    mesh=mesh, in_specs=(P("tp", None), P(None, "tp")),
                    out_specs=P(None, "tp"), check_vma=False)(xq, w)
    want = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("p", [2, 4, 8])
def test_matmul_reducescatter_i8_matches_unfused(p):
    from ant_quantization_tpu.parallel.collective_matmul import (
        matmul_reducescatter_i8)
    rng = np.random.default_rng(4)
    M, K_loc, N = 8 * p, 8, 10
    xq = jnp.asarray(rng.integers(-8, 8, (M, p * K_loc)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (p * K_loc, N)), jnp.int8)
    mesh = _mesh(p)

    got = shard_map(lambda x_l, w_l: matmul_reducescatter_i8(x_l, w_l,
                                                             "tp"),
                    mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
                    out_specs=P("tp", None), check_vma=False)(xq, w)
    want = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    # int32 ring: EXACT equality, no reduction-order tolerance needed
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
