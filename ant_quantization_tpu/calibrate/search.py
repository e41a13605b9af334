"""Calibration: scale (alpha) search, adaptive numeric-type selection, and
QuantState construction — the functional, jit-able equivalent of the
reference's ``Quantizer._init_quant_para`` (ant quant_modules.py:468-533,
olive quant_modules.py:258-292).

Design notes (TPU-first):
- All grids are trace-time constants; data-dependent choices (signedness,
  numeric type, clip scale) are dynamic *indices/selects*, so one compiled
  program calibrates any tensor of a given shape.
- The alpha scan is a ``lax.scan`` over the candidate ratio ladder carrying
  the per-channel running best — sequential like the reference's Python
  loop (memory-light), but each step is one fused snap+MSE over the whole
  tensor on the VPU.
- 4/8-bit is a ``lax.cond``: mixed-precision promotion (set_8_bit_layer_n)
  only flips a scalar in the state and re-runs the same compiled step.

Behavioral parity:
- per-channel weights / per-tensor activations (quant_modules.py:50-53)
- x_max init: absmax, or mean±3·std (Bessel-corrected, torch semantics)
  for OliVe with outliers (olive quant_modules.py:191-198,213-218)
- ratio ladder i/100 for i in [lb, ub) step 1 (ANT) / 2 (OliVe); ANT
  forces lb=95 when bit > 6 (quant_modules.py:296-297)
- strict-improvement update => earliest ratio wins MSE ties
  (quant_modules.py:305-306)
- mode chosen by summed per-channel best MSE, stable argmin => earlier
  candidate wins ties (quant_modules.py:413-415)
- ANT bit>6 forces int (quant_modules.py:482-483); float2..float4 are
  *searched* with exp_bit=1 but *finalized* with their stated width
  (quant_modules.py:377-402 vs :504-509)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..numerics import codebooks as cb
from ..ops.fake_quant import olive_fake_quant, ant_fake_quant
from ..ops.outlier import outlier_fake_quant, outlier_thresholds
from .spec import (GRID_PAD, OUTLIER_PAD, QuantState, SiteConfig, pad_grid)

__all__ = ["calibrate", "calibrate_jit", "apply_quant", "mode_index"]


def mode_index(mode: str) -> int:
    """Canonical index of a numeric type (into codebooks.ANT_MODES)."""
    return cb.ANT_MODES.index(mode)


def _grid_pair(cfg: SiteConfig, mode: str, bit: int, search: bool) -> np.ndarray:
    """(2, G) stacked [unsigned, signed] grids for one mode at one bit,
    padded to a common length. ``search=True`` applies the float2..4
    exp_bit=1 search quirk."""
    if cfg.family == "olive":
        g_u = cb.olive_grid(mode, bit, False)
        g_s = cb.olive_grid(mode, bit, True)
    else:
        m = mode
        if search and mode in ("float2", "float3", "float4"):
            m = "float1"
        g_u = cb.ant_grid(m, bit, False)
        g_s = cb.ant_grid(m, bit, True)
    n = max(g_u.shape[0], g_s.shape[0])
    return np.stack([pad_grid(g_u, n), pad_grid(g_s, n)])


def _outlier_pair(bit: int) -> np.ndarray:
    g_u = cb.olive_outlier_values(bit, False)
    g_s = cb.olive_outlier_values(bit, True)
    n = max(g_u.shape[0], g_s.shape[0])
    return np.stack([pad_grid(g_u, n), pad_grid(g_s, n)])


def _x_max(x2: jax.Array, cfg: SiteConfig, per_channel: bool) -> jax.Array:
    """Initial clip scale: absmax, or 3-sigma when OliVe outliers are on
    (olive quant_modules.py:191-198,213-218). torch .std() is
    Bessel-corrected, hence ddof=1."""
    if cfg.use_ovp:
        if per_channel:
            mean = x2.mean(axis=1)
            std = x2.std(axis=1, ddof=1)
        else:
            mean = x2.mean()
            std = x2.std(ddof=1)
        return jnp.maximum(jnp.abs(mean + 3 * std), jnp.abs(mean - 3 * std))
    if per_channel:
        return jnp.abs(x2).max(axis=1)
    return jnp.abs(x2).max()


def _fq(x2, grid, outliers, alpha, cfg: SiteConfig, per_channel: bool):
    """Fake-quant in the search's (C, K) / (N,) layout."""
    ca = 0 if per_channel else None
    if cfg.use_ovp:
        # reference pairs along the row-major flat order of (C, K): axis 1
        # (per-tensor data is already flat)
        return olive_fake_quant(x2, grid, outliers, alpha, channel_axis=ca,
                                pair_axis=1 if per_channel else 0)
    return ant_fake_quant(x2, grid, alpha, channel_axis=ca)


def _scan_alpha(x2, grid, outliers, base, ratios, cfg: SiteConfig,
                per_channel: bool):
    """Best (score, alpha) over the ratio ladder; strict-improvement update
    so the earliest ratio wins ties (quant_modules.py:299-306)."""
    ratios = jnp.asarray(ratios, jnp.float32)

    def step(carry, r):
        best_score, best_alpha = carry
        a = base * r
        q = _fq(x2, grid, outliers, a, cfg, per_channel)
        se = jnp.square(jnp.abs(q - x2))
        score = se.mean(axis=1) if per_channel else se.mean()
        upd = score < best_score
        return (jnp.where(upd, score, best_score),
                jnp.where(upd, a, best_alpha)), None

    init = (jnp.full_like(base, 1e10), base)
    (score, alpha), _ = jax.lax.scan(step, init, ratios)
    return score, alpha


def _ratio_ladder(low: int, up: int, step: int) -> np.ndarray:
    return np.arange(low, up, step, dtype=np.float64) * 0.01


def _search_bit(x2, cfg: SiteConfig, bit: int, modes: tuple[str, ...],
                low: int, per_channel: bool, signed: jax.Array,
                sticky=None):
    """Full type+scale search at one static bit-width.

    ``sticky`` (traced scalar int32, -1 = none) pins the chosen numeric
    type to a previously calibrated one: the reference overwrites
    ``self.mode`` with the CONCRETE chosen type at first calibration, so
    a recalibration (set_8_bit_layer_n resets has_inited for EVERY
    quantizer) never re-runs the adaptive search — ``"ant-" in
    self.mode`` is false by then (ant quant_modules.py:479-484, olive
    :269-274) — and only the alpha ladder re-runs on the new batch.

    Returns (mode_idx, alpha, score, grid256, outliers256)."""
    ratios = _ratio_ladder(low, cfg.up, cfg.scan_step)
    base = _x_max(x2, cfg, per_channel)
    sidx = signed.astype(jnp.int32)

    if cfg.use_ovp:
        out_pair = jnp.asarray(_outlier_pair(bit))
        outliers = out_pair[sidx]
    else:
        outliers = None

    needs_requirk = any(m in ("float2", "float3", "float4") for m in modes)

    scores, alphas, search_grids = [], [], []
    for m in modes:
        pair = jnp.asarray(_grid_pair(cfg, m, bit, search=True))
        grid = pair[sidx]
        s, a = _scan_alpha(x2, grid, outliers, base, ratios, cfg, per_channel)
        scores.append(s.sum())
        alphas.append(a)
        search_grids.append(grid)

    chosen = jnp.argmin(jnp.stack(scores))  # stable: earlier mode wins ties
    if sticky is not None and len(modes) > 1:
        mode_ids_ = jnp.asarray([mode_index(m) for m in modes], jnp.int32)
        eq = mode_ids_ == sticky
        chosen = jnp.where((sticky >= 0) & jnp.any(eq),
                           jnp.argmax(eq), chosen)

    final_pairs = jnp.asarray(
        np.stack([_grid_pair(cfg, m, bit, search=False) for m in modes]))
    final_grid = final_pairs[chosen, sidx]

    if needs_requirk:
        # final grid may differ from the searched grid: re-run the scan
        # (matches quant_modules.py:513 running search_mse on the final grid)
        score, alpha = _scan_alpha(x2, final_grid, outliers, base, ratios,
                                   cfg, per_channel)
    else:
        # search grid == final grid: reuse the chosen mode's scan result and
        # re-evaluate the per-channel MSE at its alpha (the value the
        # reference stores as self.mse, quant_modules.py:523-524)
        alpha = jnp.stack(alphas)[chosen]
        q = _fq(x2, final_grid, outliers, alpha, cfg, per_channel)
        se = jnp.square(jnp.abs(q - x2))
        score = se.mean(axis=1) if per_channel else se.mean()

    mode_ids = jnp.asarray([mode_index(m) for m in modes], jnp.int32)
    grid256 = _pad_dyn(final_grid, GRID_PAD)
    out256 = (_pad_dyn(outliers, OUTLIER_PAD) if outliers is not None
              else jnp.zeros((OUTLIER_PAD,), jnp.float32))
    return mode_ids[chosen], alpha, score, grid256, out256


def _pad_dyn(g: jax.Array, size: int) -> jax.Array:
    """Pad a 1-D grid to ``size`` by repeating its last (max) entry."""
    n = g.shape[0]
    assert n <= size
    return jnp.concatenate([g, jnp.broadcast_to(g[-1], (size - n,))]).astype(
        jnp.float32)


def calibrate(x: jax.Array, cfg: SiteConfig,
              promoted: Optional[jax.Array] = None,
              prev_mode: Optional[jax.Array] = None) -> QuantState:
    """Calibrate one tensor and return its QuantState.

    ``promoted`` (scalar bool) switches the site to 8-bit int — the dynamic
    leg of set_8_bit_layer_n. ``prev_mode`` (scalar int32, -1 = first
    calibration) pins a previously chosen adaptive numeric type: the
    reference never re-adapts on recalibration (see _search_bit). Weight
    tensors are expected channel-last (flax convention);
    cfg.channel_axis selects the per-channel dim.
    """
    if cfg.mode == "outlier":
        return _calibrate_outlier(x, cfg)

    per_channel = cfg.per_channel
    if per_channel:
        x2 = jnp.moveaxis(x, cfg.channel_axis, 0).reshape(x.shape[cfg.channel_axis], -1)
    else:
        x2 = x.reshape(-1)

    signed = jnp.asarray(cfg.is_signed) | (x.min() < 0)

    if promoted is None:
        promoted = jnp.asarray(False)
    if prev_mode is None:
        prev_mode = jnp.asarray(-1, jnp.int32)

    def low_branch(_):
        bit = cfg.bit
        modes = cfg.candidate_modes
        low = 95 if (cfg.family == "ant" and bit > 6) else cfg.low
        # bit > 6 forces the int codebook in BOTH references (ant
        # quant_modules.py:482, olive quant_modules.py:271-272); only the
        # 95% lower bound is ANT-specific.
        if bit > 6:
            modes = ("int",)
        m, a, s, g, o = _search_bit(x2, cfg, bit, modes, low, per_channel,
                                    signed, sticky=prev_mode)
        return m, a, s, g, o, jnp.asarray(bit, jnp.int32)

    def high_branch(_):
        # promotion: 8-bit forces int; ANT also forces the 95% lower bound
        low = 95 if cfg.family == "ant" else cfg.low
        m, a, s, g, o = _search_bit(x2, cfg, 8, ("int",), low, per_channel,
                                    signed)
        return m, a, s, g, o, jnp.asarray(8, jnp.int32)

    mode_idx, alpha, score, grid, outliers, bit = jax.lax.cond(
        promoted, high_branch, low_branch, operand=None)

    return QuantState(
        alpha=alpha,
        grid=grid,
        outliers=outliers,
        bit=bit,
        mode_idx=mode_idx,
        is_signed=signed,
        mse=score.mean() if per_channel else jnp.asarray(score, jnp.float32),
        initialized=jnp.asarray(True),
        aux=jnp.asarray(0.0, jnp.float32),
    )


def _calibrate_outlier(x: jax.Array, cfg: SiteConfig) -> QuantState:
    """GOBO-mode calibration (outlier_set, quant_modules.py:417-437):
    per-tensor percentile/absmax thresholds, int grid, no MSE search."""
    signed = jnp.asarray(cfg.is_signed) | (x.min() < 0)
    t4, t16 = outlier_thresholds(x, cfg.percent)
    # always per-tensor (outlier_set forces is_perchannel=False, :435)
    pair = jnp.asarray(_grid_pair(cfg, "int", cfg.bit, search=False))
    grid = pair[signed.astype(jnp.int32)]
    return QuantState(
        alpha=t4,
        grid=_pad_dyn(grid, GRID_PAD),
        outliers=jnp.zeros((OUTLIER_PAD,), jnp.float32),
        bit=jnp.asarray(cfg.bit, jnp.int32),
        mode_idx=jnp.asarray(mode_index("int"), jnp.int32),
        is_signed=signed,
        mse=jnp.asarray(0.0, jnp.float32),
        initialized=jnp.asarray(True),
        aux=t16,
    )


# Per-site jitted calibration. Keyed on (shape, dtype, cfg): a transformer
# with N identical blocks compiles the calibration program once per distinct
# tensor shape, not once per site — crucial because a whole-model jitted
# calibration pass produces an enormous HLO (scan ladder x sites) that
# compiles for many minutes at scale. Call the calibration apply() WITHOUT an
# outer jax.jit so each site dispatches this cached executable.
calibrate_jit = jax.jit(calibrate, static_argnames=("cfg",))


def apply_quant(x: jax.Array, state: QuantState, cfg: SiteConfig) -> jax.Array:
    """Fake-quantize ``x`` with a calibrated state (the hot-path forward,
    quant_modules.py:535-551 / olive :294-330)."""
    if not cfg.enabled:
        return x
    if cfg.mode == "outlier":
        return outlier_fake_quant(x, state.grid, state.alpha, state.aux,
                                  cfg.percent, state.is_signed)
    per_channel = cfg.per_channel
    ca = cfg.channel_axis if per_channel else None
    if cfg.use_ovp:
        return olive_fake_quant(x, state.grid, state.outliers, state.alpha,
                                channel_axis=ca, pair_axis=cfg.pair_axis,
                                static_bit=cfg.bit, dyn_bit=state.bit)
    return ant_fake_quant(x, state.grid, state.alpha, channel_axis=ca,
                          static_bit=cfg.bit, dyn_bit=state.bit)
