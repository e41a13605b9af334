"""Fused INT8-KV attention kernel vs the jnp oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.kernels.attention import (attention_oracle,
                                                    int8_kv_attention)
from ant_quantization_tpu.kernels.kv_cache import append_kv, init_kv


def _rand_case(B=2, H=4, T=1, S=32, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, S)), jnp.float32)
    return q, k, v, ks, vs


@pytest.mark.parametrize("T,pos0", [(1, 7), (1, 0), (5, 3), (8, 24)])
def test_kernel_matches_oracle(T, pos0):
    q, k, v, ks, vs = _rand_case(T=T, seed=T)
    p = jnp.full((2,), pos0, jnp.int32)
    got = int8_kv_attention(q, k, v, ks, vs, p, out_dtype=jnp.float32,
                            interpret=True)
    want = attention_oracle(q, k, v, ks, vs, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_per_sequence_positions():
    """Continuous batching: each sequence at a different fill depth."""
    q, k, v, ks, vs = _rand_case(B=3, seed=3)
    p = jnp.asarray([0, 9, 31], jnp.int32)
    got = int8_kv_attention(q[:3] if q.shape[0] >= 3 else q, k[:3], v[:3],
                            ks[:3], vs[:3], p, out_dtype=jnp.float32,
                            interpret=True)
    want = attention_oracle(q[:3], k[:3], v[:3], ks[:3], vs[:3], p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_alibi():
    q, k, v, ks, vs = _rand_case(T=4, seed=11)
    slopes = jnp.asarray([0.5, 0.25, 0.125, 0.0625], jnp.float32)
    p = jnp.asarray([5, 12], jnp.int32)
    got = int8_kv_attention(q, k, v, ks, vs, p, slopes,
                            out_dtype=jnp.float32, interpret=True)
    want = attention_oracle(q, k, v, ks, vs, p, slopes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_masks_unwritten_tail():
    """Positions past pos0 (garbage/zeros in a fresh cache) contribute 0."""
    q, k, v, ks, vs = _rand_case(seed=5)
    p = jnp.asarray([3, 3], jnp.int32)
    full = int8_kv_attention(q, k, v, ks, vs, p, out_dtype=jnp.float32,
                             interpret=True)
    # poison the tail; result must not change
    k2 = k.at[:, :, 5:].set(99)
    v2 = v.at[:, :, 5:].set(-99)
    poisoned = int8_kv_attention(q, k2, v2, ks, vs, p,
                                 out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(poisoned))


def test_append_layout_roundtrip():
    """append_kv writes (B, T, H, D) projections into the head-major cache
    at scalar and per-sequence vector positions."""
    B, H, S, D, T = 2, 3, 16, 8, 2
    cache = init_kv(B, S, H, D)
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)

    from ant_quantization_tpu.kernels.kv_cache import dequant_kv
    # D = 8: below the fold threshold — flat (B, H, S, D) layout
    assert cache.k.shape == (B, H, S, D)
    c1 = append_kv(cache, k_new, v_new, 4)
    deq, _ = dequant_kv(c1, jnp.float32)                # (B, H, S, D)
    got = np.asarray(deq[:, :, 4:4 + T]).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, np.asarray(k_new), rtol=0.02, atol=0.02)

    idx = jnp.asarray([1, 9], jnp.int32)
    c2 = append_kv(cache, k_new, v_new, idx)
    _, deq2 = dequant_kv(c2, jnp.float32)
    for b, i in enumerate([1, 9]):
        got = np.asarray(deq2[b, :, i:i + T]).transpose(1, 0, 2)
        np.testing.assert_allclose(got, np.asarray(v_new[b]),
                                   rtol=0.02, atol=0.02)


# ---------------------------------------------------------------------------
# Layer-indexed stacked-cache variant (the scan-carry serving path)
# ---------------------------------------------------------------------------

def _rand_stack(L=3, B=2, H=4, S=32, D=16, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, B, H, S)), jnp.float32)
    return k, v, ks, vs


@pytest.mark.parametrize("l,T,pos0", [(0, 1, 7), (2, 1, 0), (1, 5, 3)])
def test_stacked_kernel_matches_oracle(l, T, pos0):
    from ant_quantization_tpu.kernels.attention import (
        stacked_int8_kv_attention)
    L, B, H, S, D = 3, 2, 4, 32, 16
    k, v, ks, vs = _rand_stack(L, B, H, S, D, seed=l + T)
    rng = np.random.default_rng(99)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    p = jnp.full((B,), pos0, jnp.int32)
    got = stacked_int8_kv_attention(
        jnp.asarray(l, jnp.int32), q, k, v, ks, vs, p,
        out_dtype=jnp.float32, interpret=True)
    want = attention_oracle(q, k[l], v[l], ks[l], vs[l], p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_append_kv_stacked_matches_per_layer():
    """append_kv_stacked(kv, ..., l, pos) == append_kv on the layer-l
    slice, for scalar and per-sequence positions."""
    from ant_quantization_tpu.kernels.kv_cache import (QuantKV,
                                                       append_kv_stacked)
    L, B, H, S, D = 3, 2, 4, 16, 8
    rng = np.random.default_rng(7)
    base = QuantKV(
        jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8),
        jnp.asarray(rng.integers(-127, 128, (L, B, H, S, D)), jnp.int8),
        # scales plane-major (f = 1 -> (.., 1, S)), the canonical layout
        jnp.asarray(rng.uniform(0.01, 0.1, (L, B, H, 1, S)), jnp.float32),
        jnp.asarray(rng.uniform(0.01, 0.1, (L, B, H, 1, S)), jnp.float32))
    kh = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    vh = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    for pos in (jnp.asarray(5), jnp.asarray([3, 9], jnp.int32)):
        got = append_kv_stacked(base, kh, vh, 1, pos)
        want_l = append_kv(
            QuantKV(*(a[1] for a in base)), kh, vh, pos)
        for g, b0, w in zip(got, base, want_l):
            np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(b0[0]))
            np.testing.assert_array_equal(np.asarray(g[2]), np.asarray(b0[2]))
            np.testing.assert_array_equal(np.asarray(g[1]), np.asarray(w))


def test_folded_stacked_kernel_matches_oracle():
    """Lane-folded cache layout (kv_cache.py: f = 128/D positions per
    row): the stacked kernel's per-plane math must equal the flat-layout
    oracle. The fold is a row-major reshape, so the flat cache folds for
    free."""
    from ant_quantization_tpu.kernels.attention import (
        stacked_int8_kv_attention)
    L, B, H, S, D = 2, 2, 4, 32, 16
    f = 128 // D
    k, v, ks, vs = _rand_stack(L, B, H, S, D, seed=13)
    kf = k.reshape(L, B, H, S // f, f * D)
    vf = v.reshape(L, B, H, S // f, f * D)
    # scales plane-major: [.., r, s2] = scale[.., f*s2 + r]
    pm = lambda s: s.reshape(L, B, H, S // f, f).swapaxes(-1, -2)
    rng = np.random.default_rng(5)
    # ALiBi slopes exercise the per-plane ``rel = f*col + r - row - pos0``
    # bias term (BLOOM-560m-style head_dim-64 geometry folds to f > 1)
    slope_sets = (None, jnp.asarray([0.5, 0.25, 0.125, 0.0625],
                                    jnp.float32))
    for (l, T, pos0), slopes in zip(((0, 1, 9), (1, 4, 3), (0, 2, 11)),
                                    (None, None, slope_sets[1])):
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        p = jnp.full((B,), pos0, jnp.int32)
        got = stacked_int8_kv_attention(
            jnp.asarray(l, jnp.int32), q, kf, vf, pm(ks), pm(vs), p,
            slopes, out_dtype=jnp.float32, interpret=True)
        want = attention_oracle(q, k[l], v[l], ks[l], vs[l], p, slopes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_folded_append_dynamic_start():
    """Folded-cache writes at a DYNAMIC position with T > 1 (the
    lax.switch plane-stride path) and per-sequence vector positions:
    positions round-trip through dequant_kv, untouched rows stay zero."""
    from ant_quantization_tpu.kernels.kv_cache import dequant_kv
    import jax as _jax
    B, H, S, D, T = 2, 2, 64, 32, 5
    cache = init_kv(B, S, H, D)          # f = 4
    assert cache.k.shape == (B, H, S // 4, 4 * D)
    rng = np.random.default_rng(3)
    k_new = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    app = _jax.jit(lambda c, i: append_kv(c, k_new, v_new, i))
    for start in (0, 3, 17, 31):
        c = app(cache, jnp.asarray(start, jnp.int32))
        deq, _ = dequant_kv(c, jnp.float32)
        got = np.asarray(deq[:, :, start:start + T]).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(got, np.asarray(k_new),
                                   rtol=0.02, atol=0.02)
        mask = np.ones(S, bool)
        mask[start:start + T] = False
        assert np.all(np.asarray(deq)[:, :, mask] == 0)
    # per-sequence vector positions with T > 1 (speculative verify path)
    idx = jnp.asarray([3, 10], jnp.int32)
    c = _jax.jit(lambda cc, i: append_kv(cc, k_new, v_new, i))(cache, idx)
    _, deqv = dequant_kv(c, jnp.float32)
    for b, i in enumerate([3, 10]):
        got = np.asarray(deqv[b, :, i:i + T]).transpose(1, 0, 2)
        np.testing.assert_allclose(got, np.asarray(v_new[b]),
                                   rtol=0.02, atol=0.02)


def test_prefill_sized_kernel_matches_oracle():
    """The engine now routes PREFILL through the fused kernel too
    (serve/engine.py r5: the f32 dequant einsum cost 23% of a 154 ms
    OPT prefill); lock the kernel at a prefill-shaped (T ~ S) call."""
    B, H, T, S, D = 2, 2, 24, 32, 16
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, S)), jnp.float32)
    p = jnp.zeros((B,), jnp.int32)
    got = int8_kv_attention(q, k, v, ks, vs, p, out_dtype=jnp.float32,
                            interpret=True)
    want = attention_oracle(q, k, v, ks, vs, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_init_kv_rounds_odd_max_len_up_to_fold():
    """An odd max_len no longer silently degrades to the flat (2x lane
    padded) layout: init_kv rounds the allocation up to a fold multiple
    (r4 advisor finding; the attention mask covers the tail)."""
    c = init_kv(2, 33, 2, 32)            # f = 4; 33 -> 36
    assert c.k.shape == (2, 2, 9, 4 * 32)
    assert c.k_scale.shape == (2, 2, 4, 9)
    c1 = init_kv(2, 33, 2, 128)          # f = 1; 33 stays
    assert c1.k.shape == (2, 2, 33, 128)
    assert c1.k_scale.shape == (2, 2, 1, 33)
