"""Bit-level codecs (numerics/bitcodec.py): flint codeword bijection and
OVP pair packing round trips."""

import numpy as np
import pytest

from ant_quantization_tpu.numerics import bitcodec as bc
from ant_quantization_tpu.numerics import codebooks as cb


@pytest.mark.parametrize("bit", [3, 4, 5, 6])
def test_flint_codewords_bijective_and_self_delimiting(bit):
    table = bc.flint_codewords(bit, signed=True)
    words = list(table)
    # fixed width, unique, and no codeword is a prefix of another's body
    assert all(len(w) == bit for w in words)
    assert len(set(words)) == len(words)
    values = list(table.values())
    assert len(set(values)) == len(values)          # value bijection too
    # every body is used at most once and bodies form a complete or
    # near-complete prefix-free set (4-bit signed: all 8 bodies used)
    if bit == 4:
        assert len(words) == 15                     # 7 magnitudes +/- , 0


@pytest.mark.parametrize("bit", [4, 6])
def test_flint_codeword_values_match_grid(bit):
    """Decoded codeword magnitudes scaled like the OliVe normalization
    equal the olive flint grid (same underlying value set)."""
    table = bc.flint_codewords(bit, signed=True)
    e_max = (bit - 1) - 1
    scaled = sorted(v * (32.0 / 2 ** e_max) for v in table.values())
    want = sorted(float(x) for x in cb.olive_flint_values(bit, True))
    np.testing.assert_allclose(scaled, want, rtol=1e-6)


def test_flint_decode_table_shape():
    lut = bc.flint_decode_table(4, signed=True)
    assert lut.shape == (16,)
    assert (lut != 0).sum() == 14                  # +/- 7 magnitudes


def test_ovp_pack_roundtrip():
    rng = np.random.default_rng(0)
    n = 64
    normal = rng.integers(0, 16, n).astype(np.uint8)
    outlier = rng.integers(0, 16, n).astype(np.uint8)
    mask = np.zeros(n, bool)
    mask[[2, 5, 11, 62]] = True                    # one per pair max
    # victims: the pair partner of every outlier is zeroed pre-pack
    normal[[3, 4, 10, 63]] = 0

    packed, side = bc.ovp_pack(normal, outlier, mask)
    assert packed.shape == (n // 2,)
    assert side.shape == (n // 8,)                 # 2 bits per pair

    n2, o2, m2 = bc.ovp_unpack(packed, side, n)
    np.testing.assert_array_equal(m2, mask)
    np.testing.assert_array_equal(o2[mask], outlier[mask])
    keep = ~mask
    # victims return as 0; other normals exact
    np.testing.assert_array_equal(n2[keep], np.where(
        np.repeat(mask.reshape(-1, 2).any(1), 2)[keep], 0, normal[keep]))


def test_ovp_both_slots_outlier_rejected():
    normal = np.zeros(4, np.uint8)
    outlier = np.ones(4, np.uint8)
    mask = np.array([True, True, False, False])
    with pytest.raises(AssertionError):
        bc.ovp_pack(normal, outlier, mask)


def test_ovp_dense_compression_ratio():
    """Storage: N/2 bytes codes + N/8 bytes sideband = 0.625 B/element
    vs 1 B for int8 values."""
    n = 1024
    packed, side = bc.ovp_pack(np.zeros(n, np.uint8),
                               np.zeros(n, np.uint8), np.zeros(n, bool))
    assert packed.nbytes + side.nbytes == n // 2 + n // 8


def test_pack_w4_stack_rejects_odd_pair_axis():
    """OVP pair packing with an odd pair-axis length would silently pair
    a row-final outlier with the next row's first element and zero a
    genuine weight at unpack — must refuse loudly instead."""
    import pytest
    from ant_quantization_tpu.numerics.bitcodec import pack_w4_stack
    w = np.zeros((2, 5, 4), np.int8)        # K=5 odd, pairs along K
    with pytest.raises(ValueError, match="even pair-axis"):
        pack_w4_stack(w, ovp=True, pair_axis=0)
    # outlier-free packing has no pairs to misalign: odd is fine
    out = pack_w4_stack(w, ovp=False, pair_axis=0)
    from ant_quantization_tpu.numerics.bitcodec import unpack_w4_stack
    np.testing.assert_array_equal(unpack_w4_stack(out), w)
