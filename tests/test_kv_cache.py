"""Folded int8 KV storage: every (fold, idx, T) write pattern must land
codes and plane-major scales at exactly the positions the flat layout
stores them (position p -> row p//f, lanes [(p%f)D, (p%f+1)D); scale
plane p%f, row p//f) — including the aligned whole-row fast path
(idx % f == 0, f | T: one contiguous DUS via reshape, the r5 GPT2-XL
prefill fix) and the strided general branches."""

import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.kernels.kv_cache import (QuantKV, append_kv,
                                                   append_kv_stacked,
                                                   dequant_kv, init_kv)


@pytest.mark.parametrize("head_dim,fold", [(32, 4), (64, 2)])
@pytest.mark.parametrize("idx,T", [(0, 8), (0, 6), (2, 8), (3, 5), (1, 1)])
def test_folded_append_matches_flat(head_dim, fold, idx, T):
    B, H, S = 2, 3, 16
    rng = np.random.default_rng(idx * 10 + T)
    k = rng.normal(size=(B, T, H, head_dim)).astype(np.float32)
    v = rng.normal(size=(B, T, H, head_dim)).astype(np.float32)

    folded = init_kv(B, S, H, head_dim)          # auto fold
    assert folded.k.shape[-1] == fold * head_dim
    flat = init_kv(B, S, H, head_dim, fold=1)

    got = append_kv(folded, jnp.asarray(k), jnp.asarray(v), idx)
    want = append_kv(flat, jnp.asarray(k), jnp.asarray(v), idx)

    kg, vg = dequant_kv(got, jnp.float32)
    kw, vw = dequant_kv(want, jnp.float32)
    np.testing.assert_array_equal(np.asarray(kg), np.asarray(kw))
    np.testing.assert_array_equal(np.asarray(vg), np.asarray(vw))


def test_folded_append_per_sequence_positions():
    """(B,) vector positions (continuous batching) through the folded
    layout: each row must equal the flat layout's."""
    B, H, S, D = 3, 2, 16, 64
    rng = np.random.default_rng(0)
    k = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    v = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    pos = jnp.asarray([0, 3, 7])
    got = append_kv(init_kv(B, S, H, D), jnp.asarray(k), jnp.asarray(v),
                    pos)
    want = append_kv(init_kv(B, S, H, D, fold=1), jnp.asarray(k),
                     jnp.asarray(v), pos)
    for g, w in zip(dequant_kv(got, jnp.float32),
                    dequant_kv(want, jnp.float32)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_folded_append_stacked_layer_indexed():
    """Stacked (L, ...) cache: the layer-indexed write must only touch
    layer l, aligned fast path included."""
    L, B, H, S, D = 3, 2, 2, 8, 64
    rng = np.random.default_rng(1)
    kv = QuantKV(*[jnp.broadcast_to(x[None], (L,) + x.shape)
                   for x in init_kv(B, S, H, D)])
    k = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    v = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    out = append_kv_stacked(kv, jnp.asarray(k), jnp.asarray(v), 1, 0)
    ref = append_kv(init_kv(B, S, H, D), jnp.asarray(k), jnp.asarray(v), 0)
    np.testing.assert_array_equal(np.asarray(out.k[1]), np.asarray(ref.k))
    np.testing.assert_array_equal(np.asarray(out.k_scale[1]),
                                  np.asarray(ref.k_scale))
    np.testing.assert_array_equal(np.asarray(out.k[0]),
                                  np.zeros_like(np.asarray(out.k[0])))
