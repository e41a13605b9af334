"""Affine quantization helpers (ops/affine.py) vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.ops import affine as A


def test_roundtrip_is_idempotent():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64,)) * 3, jnp.float32)
    q1 = A.fake_affine_quantize(x, 8)
    q2 = A.fake_affine_quantize(q1, 8)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-6, atol=1e-6)


def test_grid_size_and_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-2, 5, (1000,)), jnp.float32)
    for bits in (4, 8, 16):
        q = A.fake_affine_quantize(x, bits)
        assert len(np.unique(np.asarray(q))) <= 2 ** bits
        step = (float(x.max()) - float(x.min())) / (2 ** bits - 1)
        assert float(jnp.abs(q - x).max()) <= step / 2 + 1e-6


def test_endpoints_exact():
    x = jnp.asarray([-1.0, 0.25, 3.0])
    q = A.fake_affine_quantize(x, 8)
    np.testing.assert_allclose(float(q[0]), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(q[2]), 3.0, atol=1e-6)


def test_degenerate_range():
    x = jnp.full((8,), 2.5)
    q = A.fake_affine_quantize(x, 4)
    assert np.isfinite(np.asarray(q)).all()


def test_ste_gradient_passthrough():
    x = jnp.asarray([0.1, -0.7, 2.3])
    g = jax.grad(lambda v: A.ste_affine_quantize(v, 4).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(3), atol=1e-6)
