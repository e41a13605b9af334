"""Codebook construction vs hand-derived value sets from the reference
formulas (ant_quantization/antquant/quant_modules.py:75-278,
olive_quantization/antquant/quant_modules.py:72-179)."""

import numpy as np
import pytest

from ant_quantization_tpu.numerics import codebooks as cb


def _set(vals):
    return sorted(set(np.round(np.asarray(vals, dtype=np.float64), 9).tolist()))


def test_int_signed_4bit():
    g = cb.ant_grid("int", 4, signed=True)
    assert g.shape == (16,)
    expect = np.arange(-8, 8, dtype=np.float64) * (10.0 / 7.0)
    np.testing.assert_allclose(g, expect, rtol=1e-6)
    # asymmetric: most negative entry goes below -10
    assert g[0] < -10.0 and g[-1] == 10.0


def test_int_unsigned_4bit():
    g = cb.ant_grid("int", 4, signed=False)
    assert g.shape == (16,)
    np.testing.assert_allclose(g, np.arange(16) * (10.0 / 15.0), rtol=1e-6)


def test_pot_signed_4bit():
    g = cb.ant_grid("pot", 4, signed=True)
    assert g.shape == (16,)
    mags = [1, 2, 4, 8, 16, 32, 64]
    expect = [0.0, 0.0] + mags + [-m for m in mags]  # padded duplicate zero
    np.testing.assert_allclose(np.sort(g),
                               np.sort(np.array(expect) * 10.0 / 64.0),
                               rtol=1e-6)


def test_float_4bit_equals_pot_4bit():
    # At 4-bit signed, B=3 leaves 0 mantissa bits, so float(e=3) degenerates
    # to the PoT value set {0, ±2^0..±2^6} — explains why FIP == IP columns
    # match at 4-bit in the reference's README tables.
    f = cb.ant_grid("float", 4, signed=True)
    p = cb.ant_grid("pot", 4, signed=True)
    np.testing.assert_allclose(np.sort(f), np.sort(p), rtol=1e-6)


def test_flint_signed_4bit():
    g = cb.ant_grid("flint", 4, signed=True)
    assert g.shape == (16,)
    mags = [0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0]
    vals = [0.0, 0.0] + mags + [-m for m in mags]
    np.testing.assert_allclose(np.sort(g),
                               np.sort(np.array(vals) * 2.5), rtol=1e-6)


def test_flint_6bit_structure():
    # 6-bit signed flint: B=5, exponents -4..4, endpoint ±16.
    vals = cb.flint_values(6, signed=True)
    mags = sorted(set(abs(v) for v in vals if v > 0))
    assert max(mags) == 16.0
    assert min(mags) == 2.0 ** -4
    g = cb.ant_grid("flint", 6, signed=True)
    assert g.shape == (64,) and g[-1] == 10.0


def test_apot_signed_4bit():
    g = cb.ant_grid("apot", 4, signed=True)
    assert g.shape == (16,)
    # B=3: base_a={0,1/2,1/4,1/16}, base_b={0,1/8}
    mags = sorted(a + b for a in (0, .5, .25, .0625) for b in (0, .125))
    expect = sorted([m for m in mags] + [-m for m in mags])
    np.testing.assert_allclose(np.sort(g),
                               np.array(expect) * 10.0 / max(mags), rtol=1e-6)


def test_float_subnormals_6bit():
    # 6-bit signed float e=3: B=5, man=2. Subnormal binade: j/4 for j=1..3.
    vals = cb.float_values(6, signed=True, exp_bit=3)
    pos = sorted(v for v in vals if v > 0)
    assert pos[:3] == [0.25, 0.5, 0.75]
    # largest: i=7 -> 2^6 * (1 + 3/4) = 112
    assert pos[-1] == 112.0


def test_all_ant_grids_are_16_entries_sorted():
    for mode in ("int", "pot", "apot", "float", "flint"):
        for signed in (True, False):
            g = cb.ant_grid(mode, 4, signed)
            assert g.shape == (16,)
            assert np.all(np.diff(g) >= 0)
            assert g.max() == pytest.approx(10.0)


def test_olive_int_4bit():
    # symmetric: the OliVe fork's int_value does NOT append -2^B like
    # ANT's does (olive quant_modules.py:72-91) — verified against the
    # reference implementation in test_reference_oracle.py
    g = cb.olive_int_values(4, signed=True)
    np.testing.assert_allclose(g, np.arange(-7, 8) * 4.0)
    assert g.shape == (15,)
    assert g.max() == 28.0 and g.min() == -28.0


def test_olive_flint_4bit():
    g = cb.olive_flint_values(4, signed=True)
    mags = [2.0, 4.0, 6.0, 8.0, 12.0, 16.0, 32.0]
    expect = sorted([0.0] + mags + [-m for m in mags])
    np.testing.assert_allclose(np.sort(g), expect)
    assert g.shape == (15,)  # OliVe grids are not padded


def test_olive_outliers_4bit():
    g = cb.olive_outlier_values(4, signed=True)
    mags = [48, 64, 96, 128, 192, 256, 384]
    expect = sorted(mags + [-m for m in mags])
    np.testing.assert_allclose(g, expect)
    # strictly beyond the normal/outlier threshold
    assert np.all(np.abs(g) > 32)


def test_olive_8bit_int():
    g = cb.olive_int_values(8, signed=True)
    assert g.shape == (255,)      # symmetric, no -2^B entry
    assert g.max() == pytest.approx(32.0 - 32 / 128)
    assert g.min() == pytest.approx(-(32.0 - 32 / 128))
