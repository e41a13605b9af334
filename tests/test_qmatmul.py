"""Packed-W4 fused dequant+matmul kernel (interpret mode on CPU) vs jnp
oracle and vs the fake-quant path."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.kernels.qmatmul import (dequant_w4_reference,
                                                  pack_w4,
                                                  quantized_matmul_w4,
                                                  quantize_weights_w4)
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.fake_quant import ant_fake_quant


def test_pack_roundtrip(rng):
    codes = jnp.asarray(rng.integers(0, 16, size=(64, 32)))
    packed = pack_w4(codes)
    assert packed.shape == (32, 32) and packed.dtype == jnp.uint8
    lo = packed & 0xF
    hi = packed >> 4
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(codes[:32]))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(codes[32:]))


def test_qmm_matches_oracle(rng):
    K, N, M = 256, 256, 8
    grid = jnp.asarray(cb.ant_grid("flint", 4, True))[:16]
    codes = jnp.asarray(rng.integers(0, 16, size=(K, N)))
    packed = pack_w4(codes)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(N,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    got = quantized_matmul_w4(x, packed, scale, grid, interpret=True)
    want = x @ dequant_w4_reference(packed, scale, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_qmm_multiblock(rng):
    K, N, M = 512, 512, 4
    grid = jnp.asarray(cb.ant_grid("int", 4, True))[:16]
    codes = jnp.asarray(rng.integers(0, 16, size=(K, N)))
    packed = pack_w4(codes)
    scale = jnp.float32(0.05) * jnp.ones((N,))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    got = quantized_matmul_w4(x, packed, scale, grid, block_n=128,
                              block_k2=128, interpret=True)
    want = x @ dequant_w4_reference(packed, scale, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_quantize_weights_matches_fake_quant(rng):
    """Packing + kernel == the fake-quant forward (real-quant serving path
    is numerically identical to the accuracy-eval path)."""
    K, N, M = 128, 64, 4
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.2)
    grid = jnp.asarray(cb.ant_grid("flint", 4, True))
    alpha = jnp.abs(w).max(axis=0)

    packed, scale = quantize_weights_w4(w, grid, alpha)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    got = quantized_matmul_w4(x, packed, scale, grid[:16], interpret=True)

    wq = ant_fake_quant(w, grid, alpha, channel_axis=-1)
    want = x @ wq
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int8_codebook_exact_for_all_4bit_grids():
    """Every ANT/OliVe 4-bit grid is exactly int8-representable (the
    dyadic-rational argument in kernels/qmatmul.py:int8_codebook)."""
    from ant_quantization_tpu.kernels.qmatmul import int8_codebook
    grids = []
    for mode in ("int", "pot", "apot", "float", "flint"):
        grids.append(cb.ant_grid(mode, 4, True))
    # unsigned pot/float span >127:1 and are NOT int8-exact (the engine
    # falls back to fake-quant for such activation grids)
    for mode in ("int", "apot", "flint"):
        grids.append(cb.ant_grid(mode, 4, False))
    for mode in ("int", "flint"):
        for signed in (True, False):
            grids.append(cb.olive_grid(mode, 4, signed))
    for g in grids:
        q16, unit, exact = int8_codebook(np.asarray(g)[:16])
        assert exact
        # grids are f32 arrays: representation error ~1e-7 relative
        np.testing.assert_allclose(q16.astype(np.float64) * unit,
                                   np.asarray(g)[:16], rtol=1e-5, atol=1e-6)


def test_quantize_weights_w4_i8_matches_fake_quant(rng):
    from ant_quantization_tpu.kernels.qmatmul import quantize_weights_w4_i8
    K, N = 128, 64
    grid = jnp.asarray(cb.ant_grid("flint", 4, True))[:16]
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(1.0, 3.0, size=(N,)).astype(np.float32))
    w_i8, oscale = quantize_weights_w4_i8(w, grid, alpha)
    assert w_i8.dtype == jnp.int8
    want = ant_fake_quant(w, grid, alpha, channel_axis=1)
    np.testing.assert_allclose(
        np.asarray(w_i8, np.float32) * np.asarray(oscale)[None, :],
        np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_w8a8_matmul_matches_oracle():
    """Fused snap+int8-matmul kernel == unfused snap -> int32 dot oracle."""
    import numpy as np
    from ant_quantization_tpu.kernels.qmatmul import fused_w8a8_matmul
    rng = np.random.default_rng(0)
    M, K, N = 5, 64, 48
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.integers(-64, 64, (K, N)), jnp.int8)
    a_q = jnp.asarray(np.sort(rng.choice(np.arange(-127, 128), 16,
                                         replace=False)), jnp.int8)
    a_scale = jnp.asarray(0.07, jnp.float32)
    oscale = jnp.asarray(rng.uniform(1e-4, 1e-3, (N,)), jnp.float32)

    got = fused_w8a8_matmul(x, w, a_q, a_scale, a_scale * oscale,
                            interpret=True)

    g = np.asarray(a_q, np.float64)
    xs = np.asarray(x) / 0.07
    mids = (g[1:] + g[:-1]) / 2
    idx = np.zeros(x.shape, np.int64)
    for m in mids:
        idx += (xs >= m)
    xq = g[idx].astype(np.int32)
    want = (xq @ np.asarray(w, np.int32)).astype(np.float32) \
        * np.asarray(a_scale * oscale)[None, :]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
