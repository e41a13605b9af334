"""GOBO-style outlier baseline mode vs a numpy oracle of the reference's
outlier_set/outlier_quant (ant quant_modules.py:417-465)."""

import numpy as np

import jax.numpy as jnp

from ant_quantization_tpu.calibrate.search import apply_quant, calibrate
from ant_quantization_tpu.calibrate.spec import SiteConfig
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.outlier import (outlier_fake_quant,
                                              outlier_thresholds)


def _oracle(x, grid, percent, signed):
    t4 = np.percentile(np.abs(x), percent * 100)
    t16 = np.abs(x).max()
    out = x.copy()
    if t4 > 0:
        scale = t4 / grid.max()
        xs = x / scale
        # snap with tie-to-larger (<= comparison over ascending grid)
        d = np.abs(xs[..., None] - grid[None, :])
        idx = len(grid) - 1 - np.argmin(d[..., ::-1], axis=-1)
        out = grid[idx] * scale
    mask = np.abs(x) > t4
    level = 2 ** 16 - 1 if signed else 2 ** 15 - 1
    if percent < 1.0:
        scale16 = (t16 - t4) / level
        mag = np.abs(x[mask]) - t4
        q = np.round(mag / scale16) * scale16 + t4
        out[mask] = q * np.sign(x[mask])
    return t4, t16, out


def test_outlier_matches_oracle(rng):
    x = rng.normal(size=512).astype(np.float32) * 3
    grid = cb.ant_grid("int", 4, True)
    percent = 0.95
    t4_ref, t16_ref, ref = _oracle(x, grid, percent, True)

    t4, t16 = outlier_thresholds(jnp.asarray(x), percent)
    assert float(t4) == np.float32(t4_ref)
    assert float(t16) == np.float32(t16_ref)
    got = outlier_fake_quant(jnp.asarray(x), jnp.asarray(grid), t4, t16,
                             percent, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_outlier_calibrate_and_apply(rng):
    x = rng.normal(size=(16, 32)).astype(np.float32)
    cfg = SiteConfig(bit=4, mode="outlier", family="ant", percent=0.9,
                     is_signed=True)
    st = calibrate(jnp.asarray(x), cfg)
    assert bool(st.initialized) and float(st.aux) > float(st.alpha) > 0
    q = np.asarray(apply_quant(jnp.asarray(x), st, cfg))
    assert q.shape == x.shape and np.isfinite(q).all()
    # values above the percentile threshold keep ~16-bit fidelity
    mask = np.abs(x) > float(st.alpha)
    np.testing.assert_allclose(q[mask], x[mask], rtol=1e-3, atol=1e-3)
