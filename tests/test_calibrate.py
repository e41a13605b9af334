"""Calibration engine vs a numpy oracle transcribing the reference's
search_mse / search_adaptive_numeric_type / _init_quant_para logic
(ant quant_modules.py:280-533, olive quant_modules.py:189-292)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.calibrate.search import (apply_quant, calibrate,
                                                   mode_index)
from ant_quantization_tpu.calibrate.spec import SiteConfig

# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------


def _np_snap_last_tie(xs, grid):
    d = np.abs(xs[..., None] - grid.astype(xs.dtype))
    return grid[(grid.shape[0] - 1) - np.argmin(d[..., ::-1], axis=-1)]


def _np_ovp(q):
    mask = np.abs(q) > 32
    v_odd = np.roll(mask, 1)
    v_odd[::2] = False
    v_even = np.roll(mask & ~v_odd, -1)
    v_even[1::2] = False
    return q * ~(v_even | v_odd)


def _np_forward(x2, grid, alpha, per_channel, outliers=None):
    scale = alpha / grid.max()
    if per_channel:
        xs = x2 / scale[:, None]
    else:
        xs = x2 / scale
    g = grid if outliers is None else np.concatenate([grid, outliers])
    q = _np_snap_last_tie(xs.astype(np.float32), g.astype(np.float32))
    if outliers is not None:
        q = _np_ovp(q.reshape(-1)).reshape(q.shape)
    if per_channel:
        return q * scale[:, None]
    return q * scale


def _np_search_mse(x2, grid, per_channel, lb, ub, step, three_sigma):
    if per_channel:
        if three_sigma:
            mean, std = x2.mean(1), x2.std(1, ddof=1)
            x_max = np.maximum(np.abs(mean + 3 * std), np.abs(mean - 3 * std))
        else:
            x_max = np.abs(x2).max(1)
        best = np.full_like(x_max, 1e10)
        alpha = x_max.copy()
        for i in range(lb, ub, step):
            a = x_max * (i * 0.01)
            q = _np_forward(x2, grid, a, True,
                            outliers=_ol if three_sigma else None)
            score = ((q - x2) ** 2).mean(1)
            upd = score < best
            alpha[upd] = a[upd]
            best[upd] = score[upd]
        return best, alpha
    else:
        if three_sigma:
            mean, std = x2.mean(), x2.std(ddof=1)
            x_max = max(abs(mean + 3 * std), abs(mean - 3 * std))
        else:
            x_max = np.abs(x2).max()
        best, alpha = 1e10, x_max
        for i in range(lb, ub, step):
            a = x_max * (i * 0.01)
            q = _np_forward(x2, grid, np.float32(a), False,
                            outliers=_ol if three_sigma else None)
            score = ((q - x2) ** 2).mean()
            if score < best:
                best, alpha = score, a
        return best, alpha


_ol = None  # set per-test for the olive oracle


# ---------------------------------------------------------------------------
# ANT tests
# ---------------------------------------------------------------------------

def test_ant_weight_type_selection_and_alpha(rng):
    global _ol
    _ol = None
    x = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = SiteConfig(bit=4, mode="ant-int-pot-flint", family="ant",
                     channel_axis=0)
    st = jax.jit(lambda x: calibrate(x, cfg))(jnp.asarray(x))

    # oracle: search in reference order int, flint, pot
    scores = {}
    alphas = {}
    for m in ("int", "flint", "pot"):
        grid = cb.ant_grid(m, 4, True)
        best, a = _np_search_mse(x, grid, True, 75, 150, 1, False)
        scores[m] = best.sum()
        alphas[m] = (best, a)
    want = min(scores, key=lambda m: scores[m])
    assert int(st.mode_idx) == mode_index(want)
    np.testing.assert_allclose(np.asarray(st.alpha), alphas[want][1],
                               rtol=1e-5)
    assert float(st.mse) == pytest.approx(alphas[want][0].mean(), rel=1e-4)
    assert int(st.bit) == 4 and bool(st.is_signed)


def test_ant_activation_per_tensor(rng):
    x = np.abs(rng.normal(size=(4, 32)).astype(np.float32))  # unsigned
    cfg = SiteConfig(bit=4, mode="ant-int-pot-flint", family="ant",
                     is_input=True, is_signed=False)
    st = jax.jit(lambda x: calibrate(x, cfg))(jnp.asarray(x))
    assert not bool(st.is_signed)
    assert np.asarray(st.alpha).shape == ()
    scores = {}
    for m in ("int", "flint", "pot"):
        grid = cb.ant_grid(m, 4, False)
        best, a = _np_search_mse(x.reshape(-1), grid, False, 75, 150, 1, False)
        scores[m] = (best, a)
    want = min(scores, key=lambda m: scores[m][0])
    assert int(st.mode_idx) == mode_index(want)
    assert float(st.alpha) == pytest.approx(scores[want][1], rel=1e-5)


def test_ant_signedness_flips_for_negative_input(rng):
    x = rng.normal(size=(4, 32)).astype(np.float32)  # has negatives
    cfg = SiteConfig(bit=4, mode="ant-flint", family="ant",
                     is_input=True, is_signed=False)
    st = calibrate(jnp.asarray(x), cfg)
    assert bool(st.is_signed)


def test_ant_8bit_promotion_forces_int_and_95(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = SiteConfig(bit=4, mode="ant-int-pot-flint", family="ant",
                     channel_axis=0)
    st = jax.jit(lambda x, p: calibrate(x, cfg, promoted=p))(
        jnp.asarray(x), jnp.asarray(True))
    assert int(st.bit) == 8
    assert int(st.mode_idx) == mode_index("int")
    grid = cb.ant_grid("int", 8, True)
    best, a = _np_search_mse(x, grid, True, 95, 150, 1, False)
    np.testing.assert_allclose(np.asarray(st.alpha), a, rtol=1e-5)
    # stored grid is padded to 256 by repeating the max
    g = np.asarray(st.grid)
    np.testing.assert_allclose(g[:256], grid, rtol=1e-6)


def test_apply_quant_roundtrip(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = SiteConfig(bit=4, mode="ant-int-pot-flint", family="ant",
                     channel_axis=0)
    st = calibrate(jnp.asarray(x), cfg)
    q = apply_quant(jnp.asarray(x), st, cfg)
    assert q.shape == x.shape
    # quantized output matches the oracle forward at the calibrated alpha
    mode = cb.ANT_MODES[int(st.mode_idx)]
    grid = cb.ant_grid(mode, 4, True)
    want = _np_forward(x, grid, np.asarray(st.alpha), True)
    np.testing.assert_allclose(np.asarray(q), want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# OliVe tests
# ---------------------------------------------------------------------------

def test_olive_weight_with_ovp(rng):
    global _ol
    x = rng.normal(size=(8, 64)).astype(np.float32)
    x[:, ::17] *= 10  # outliers
    _ol = cb.olive_outlier_values(4, True)
    cfg = SiteConfig(bit=4, mode="ant-int-flint", family="olive",
                     w_up=250, a_up=250, scan_step=2, channel_axis=0)
    st = jax.jit(lambda x: calibrate(x, cfg))(jnp.asarray(x))
    scores = {}
    for m in ("int", "flint"):
        grid = cb.olive_grid(m, 4, True)
        best, a = _np_search_mse(x, grid, True, 75, 250, 2, True)
        scores[m] = (best.sum(), a, best)
    want = min(scores, key=lambda m: scores[m][0])
    assert int(st.mode_idx) == mode_index(want)
    np.testing.assert_allclose(np.asarray(st.alpha), scores[want][1],
                               rtol=1e-5)
    assert float(st.mse) == pytest.approx(scores[want][2].mean(), rel=1e-4)


def test_olive_no_outlier_absmax_init(rng):
    global _ol
    _ol = None
    x = rng.normal(size=(8, 64)).astype(np.float32)
    cfg = SiteConfig(bit=4, mode="ant-int-flint", family="olive",
                     w_up=250, a_up=250, scan_step=2, no_outlier=True,
                     channel_axis=0)
    st = calibrate(jnp.asarray(x), cfg)
    scores = {}
    for m in ("int", "flint"):
        grid = cb.olive_grid(m, 4, True)
        best, a = _np_search_mse(x, grid, True, 75, 250, 2, False)
        scores[m] = (best.sum(), a)
    want = min(scores, key=lambda m: scores[m][0])
    assert int(st.mode_idx) == mode_index(want)
    np.testing.assert_allclose(np.asarray(st.alpha), scores[want][1],
                               rtol=1e-5)


def test_olive_8bit_forces_int(rng):
    """ADVICE r3 (medium): bit > 6 forces the int codebook in BOTH
    references (olive quant_modules.py:271-272, ant :482) — the family
    guard must not exempt olive. An 8-bit olive --no_outlier site with an
    adaptive mode string must calibrate an int (uniform) grid, and the
    uniform fast-snap path must then reproduce exact grid points."""
    x = rng.normal(size=(4, 64)).astype(np.float32) * 4.0
    cfg = SiteConfig(bit=8, mode="ant-int-flint", family="olive",
                     no_outlier=True, channel_axis=0, scan_step=2,
                     w_low=75, w_up=250)
    st = jax.jit(lambda x: calibrate(x, cfg))(jnp.asarray(x))
    assert int(st.bit) == 8
    assert int(st.mode_idx) == mode_index("int")
    grid = cb.olive_grid("int", 8, True)
    np.testing.assert_allclose(np.asarray(st.grid)[:grid.shape[0]], grid,
                               rtol=1e-6)
    # uniform-path snap: a value equal to alpha*g/gmax must round-trip
    q = apply_quant(jnp.asarray(x), st, cfg)
    scale = np.asarray(st.alpha)[:, None] / grid.max()
    xs = x / scale
    # all snapped values must land on the real (255-entry) grid exactly
    qs = np.asarray(q) / scale
    dist = np.abs(qs[..., None] - grid[None, None, :]).min(-1)
    assert float(dist.max()) < 1e-4


def test_recalibration_pins_previous_adaptive_type():
    """The reference never re-runs the adaptive type search on
    recalibration: self.mode is overwritten with the CONCRETE chosen
    type at first calibration, so after set_8_bit_layer_n resets
    has_inited, only the alpha ladder re-runs (ant quant_modules.py:
    479-484, olive :269-274). calibrate(prev_mode=...) must pin the
    type even when the new batch would prefer the other candidate."""
    import jax.numpy as jnp
    import numpy as np
    from ant_quantization_tpu.calibrate.search import calibrate, mode_index
    from ant_quantization_tpu.calibrate.spec import SiteConfig

    cfg = SiteConfig(bit=4, is_input=True, is_signed=False,
                     mode="ant-int-flint", family="olive",
                     w_low=75, w_up=250, a_low=75, a_up=250, scan_step=2)
    rng = np.random.default_rng(0)
    # uniform-ish data prefers int; heavy-tailed prefers flint
    x_uniform = jnp.asarray(rng.uniform(0, 1, (4, 64)), jnp.float32)
    x_tailed = jnp.asarray(rng.normal(size=(4, 64)) ** 3, jnp.float32)

    st_u = calibrate(x_uniform, cfg)
    st_t = calibrate(x_tailed, cfg)
    if int(st_u.mode_idx) == int(st_t.mode_idx):
        import pytest
        pytest.skip("both batches chose the same type; no flip to pin")

    # recalibrating on the OTHER batch with prev_mode pinned keeps the
    # original type (and only the alpha changes)
    st_re = calibrate(x_tailed, cfg,
                      prev_mode=jnp.asarray(st_u.mode_idx, jnp.int32))
    assert int(st_re.mode_idx) == int(st_u.mode_idx)
    # without the pin it flips
    st_free = calibrate(x_tailed, cfg)
    assert int(st_free.mode_idx) == int(st_t.mode_idx)
