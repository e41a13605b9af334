"""Fake-quant forward/STE vs a numpy oracle of the reference arithmetic
(ant quant_modules.py:535-551, olive quant_modules.py:294-330)."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.fake_quant import ant_fake_quant, olive_fake_quant


def _oracle_ant(x, grid, alpha, channel_axis=None):
    scale = np.asarray(alpha, dtype=np.float64) / grid.max()
    if channel_axis is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = -1
        scale = scale.reshape(shape)
    xs = (x / scale).astype(np.float32)
    d = np.abs(xs[..., None] - grid.astype(np.float32))
    codes = (grid.shape[0] - 1) - np.argmin(d[..., ::-1], axis=-1)
    return grid.astype(np.float32)[codes] * scale


def test_ant_per_tensor(rng):
    grid = cb.ant_grid("flint", 4, True)
    x = rng.normal(size=(32, 64)).astype(np.float32)
    alpha = np.float32(2.5)
    out = ant_fake_quant(jnp.asarray(x), jnp.asarray(grid), alpha)
    np.testing.assert_allclose(np.asarray(out),
                               _oracle_ant(x, grid, alpha), rtol=1e-5)


def test_ant_per_channel(rng):
    grid = cb.ant_grid("int", 4, True)
    x = rng.normal(size=(16, 9, 3)).astype(np.float32) * 3
    alpha = np.abs(x).reshape(16, -1).max(1).astype(np.float32)
    out = ant_fake_quant(jnp.asarray(x), jnp.asarray(grid),
                         jnp.asarray(alpha), channel_axis=0)
    np.testing.assert_allclose(np.asarray(out),
                               _oracle_ant(x, grid, alpha, 0), rtol=1e-5)


def test_values_land_on_scaled_grid(rng):
    grid = cb.ant_grid("pot", 4, True)
    x = rng.normal(size=512).astype(np.float32)
    alpha = np.float32(1.7)
    out = np.asarray(ant_fake_quant(jnp.asarray(x), jnp.asarray(grid), alpha))
    scaled = grid * (alpha / grid.max())
    for v in np.unique(out):
        assert np.min(np.abs(scaled - v)) < 1e-6


def test_ste_gradient_is_straight_through(rng):
    grid = jnp.asarray(cb.ant_grid("int", 4, True))
    x = jnp.asarray(rng.normal(size=64).astype(np.float32))

    def f(x):
        return jnp.sum(ant_fake_quant(x, grid, jnp.float32(2.0)))

    g = jax.grad(f)(x)
    # d out / d x == 1 everywhere under STE (out = x + sg(q - xs)*scale)
    np.testing.assert_allclose(np.asarray(g), np.ones(64), rtol=1e-6)


def test_alpha_gradient_flows(rng):
    grid = jnp.asarray(cb.ant_grid("flint", 4, True))
    x = jnp.asarray(rng.normal(size=64).astype(np.float32))

    def f(a):
        return jnp.sum(ant_fake_quant(x, grid, a) ** 2)

    g = jax.grad(f)(jnp.float32(2.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_olive_no_outlier_matches_ant(rng):
    grid = jnp.asarray(cb.olive_int_values(4, True))
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    a = jnp.float32(3.0)
    np.testing.assert_array_equal(
        np.asarray(olive_fake_quant(x, grid, None, a)),
        np.asarray(ant_fake_quant(x, grid, a)))


def test_olive_ovp_end_to_end(rng):
    grid = jnp.asarray(cb.olive_flint_values(4, True))
    outliers = jnp.asarray(cb.olive_outlier_values(4, True))
    # mostly small values with a few huge outliers
    x = rng.normal(size=1024).astype(np.float32)
    x[::100] *= 40
    x = jnp.asarray(x)
    alpha = jnp.float32(float(jnp.abs(x).mean() * 3))
    out = np.asarray(olive_fake_quant(x, grid, outliers, alpha))
    scale = float(alpha) / 32.0
    # outliers are preserved beyond the normal range
    assert np.abs(out).max() > 32 * scale
    # victims: neighbor of each preserved outlier within its pair is zero
    q = out / scale
    flat_outliers = np.abs(q) > 32 + 1e-4
    for i in np.nonzero(flat_outliers)[0]:
        j = i + 1 if i % 2 == 0 else i - 1
        assert q[j] == 0.0, f"victim at {j} not zeroed"
