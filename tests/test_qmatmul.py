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
