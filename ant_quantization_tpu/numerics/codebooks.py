"""Codebook (value-grid) construction for ANT and OliVe numeric types.

ANT [MICRO'22] selects, per tensor, one of several <=2^bit-entry value grids
(int / power-of-two / additive-PoT / float(e,m) / flint) by MSE search.
OliVe [ISCA'23] keeps int/flint normalized to a fixed outlier threshold (32)
and adds a wide-range "abfloat" outlier grid.

Everything here is closed-form and host-side (numpy): grids depend only on
(bit, signed, mode), never on data, so they are computed once at trace time
and baked into the compiled program as constants.

Behavioral parity notes (vs /root/reference):
- ANT grids are normalized by ``convert_tensor``: sort ascending, pad with a
  single extra 0 if one entry short of 2^bit, then scale so max == 10.0
  (ant_quantization/antquant/quant_modules.py:75-83).
- OliVe grids are sorted but *not* padded; int is scaled by 32/2^B and flint
  by 32/2^exp_max so the normal/outlier threshold sits at magnitude 32
  (olive_quantization/antquant/quant_modules.py:86-91,148-151).
- The reference defines ``float_value`` twice; the second definition (with
  subnormals, quant_modules.py:157-187) shadows the first and is the one
  replicated here.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ant_normalize",
    "int_values",
    "pot_values",
    "apot_values",
    "float_values",
    "flint_values",
    "ant_grid",
    "olive_int_values",
    "olive_flint_values",
    "olive_outlier_values",
    "olive_grid",
    "ANT_MODES",
    "grid_size",
]

# Candidate-mode vocabulary for ANT's adaptive type search, in the order the
# reference tests them (quant_modules.py:328-415). The order matters for MSE
# ties: np.argsort is stable, so the earlier mode wins.
ANT_MODES = ("int", "flint", "pot", "float", "float1", "float2", "float3",
             "float4", "apot")


def _value_bits(bit: int, signed: bool) -> int:
    """Magnitude bits: the sign consumes one bit when signed."""
    return bit - 1 if signed else bit


def ant_normalize(values: list[float], bit: int) -> np.ndarray:
    """ANT's ``convert_tensor``: sort, pad one 0 if short, scale max to 10.0.

    Mirrors ant_quantization/antquant/quant_modules.py:75-83 (including the
    assert that the grid is exactly 2^bit entries).
    """
    values = list(values)
    if 2 ** bit > len(values):
        values.append(0.0)
    assert 2 ** bit == len(values), (
        f"grid has {len(values)} entries, expected {2 ** bit}")
    arr = np.sort(np.asarray(values, dtype=np.float64))
    arr = arr * (10.0 / arr.max())
    return arr.astype(np.float32)


def _signed_extend(mags: list[float], signed: bool) -> list[float]:
    """Append the negation of every magnitude when signed (keeps +0/-0 dups,
    matching the reference's list construction)."""
    if not signed:
        return list(mags)
    out = []
    for v in mags:
        out.append(v)
        out.append(-v)
    return out


def int_values(bit: int, signed: bool) -> list[float]:
    """Uniform integer grid (quant_modules.py:204-221).

    Signed grids are *asymmetric*: they include -2^B but the positive end
    stops at 2^B - 1, so after max-to-10 normalization the most negative
    entry is below -10.
    """
    b = _value_bits(bit, signed)
    values = [0.0]
    for i in range(1, 2 ** b):
        values.append(float(i))
        if signed:
            values.append(float(-i))
    if signed:
        values.append(float(-(2 ** b)))
    return values


def pot_values(bit: int, signed: bool) -> list[float]:
    """Power-of-two grid: 0 and +/-2^i for i in [0, 2^B - 1)
    (quant_modules.py:189-201)."""
    b = _value_bits(bit, signed)
    values = [0.0]
    for i in range(0, 2 ** b - 1):
        values.append(float(2 ** i))
        if signed:
            values.append(float(-(2 ** i)))
    return values


_APOT_BASES = {
    # B -> (base_a, base_b, base_c) exponent tables, quant_modules.py:85-121.
    2: ([-1, -2, -3], [], []),
    3: ([-1, -2, -4], [-3], []),
    4: ([-1, -3, -5], [-2, -4, -6], []),
    5: ([-1, -3, -6], [-2, -4, -7], [-5]),
    6: ([-1, -4, -7], [-2, -5, -8], [-3, -6, -9]),
}


def apot_values(bit: int, signed: bool) -> list[float]:
    """Additive-powers-of-two grid (quant_modules.py:85-131).

    Each value is a sum of up to three powers of two drawn from per-B base
    tables; only B in {2,...,6} is defined (the reference silently produces
    an invalid grid otherwise).
    """
    b = _value_bits(bit, signed)
    if b not in _APOT_BASES:
        raise ValueError(f"apot undefined for value bits {b}")
    ea, eb, ec = _APOT_BASES[b]
    base_a = [0.0] + [2.0 ** e for e in ea]
    base_b = [0.0] + [2.0 ** e for e in eb]
    base_c = [0.0] + [2.0 ** e for e in ec]
    values = []
    for a in base_a:
        for bb in base_b:
            for c in base_c:
                values.append(a + bb + c)
                if signed:
                    values.append(-(a + bb + c))
    return values


def float_values(bit: int, signed: bool, exp_bit: int = 3) -> list[float]:
    """Low-bit float grid with one subnormal binade
    (quant_modules.py:157-187, the second/overriding definition).

    Exponent i == 0 is the subnormal binade (values j * 2^-m); i >= 1 encode
    2^(i-1) * (1 + j * 2^-m). The very first slot is 0 (appended once, never
    sign-extended).
    """
    b = _value_bits(bit, signed)
    man_bit = b - exp_bit
    if b == 2:
        exp_bit, man_bit = 2, 0
    if man_bit < 0:
        raise ValueError(
            f"float grid needs value bits >= exp bits ({b} < {exp_bit})")
    values = []
    first = True
    for i in range(2 ** exp_bit):
        for j in range(2 ** man_bit):
            if first:
                values.append(0.0)
                first = False
                continue
            if i == 0:  # subnormal binade
                v = j * 2.0 ** (-man_bit)
            else:
                v = 2.0 ** (i - 1) * (1 + j * 2.0 ** (-man_bit))
            values.append(v)
            if signed:
                values.append(-v)
    return values


def _flint_magnitudes(value_bit: int, exp_base: int,
                      neg_exp_base: bool) -> list[float]:
    """Magnitudes of the flint grid (quant_modules.py:223-278).

    Flint spends a variable number of bits on the exponent (a leading-1
    terminated prefix code): |exp| = e costs e+1 exponent bits, leaving
    value_bit - (e+2) mantissa bits... encoded here purely as the resulting
    value set. Exponents run -(B-1) .. +(B-1); the extreme positive exponent
    has no mantissa and appears only as the endpoint 2^(B-1).

    ``neg_exp_base`` replicates a reference quirk: the ANT version applies
    exp_base inside the negative-exponent loop while the OliVe version does
    not (both use exp_base == 0 in practice, so the sets coincide).
    """
    mags = []
    # negative exponents: i = 0..B-1 -> exp = -(i+1), mant = B - i - 2
    for i in range(0, value_bit):
        exp_value = -(i + 1)
        mant_bit = value_bit - (i + 2)
        if mant_bit < 0:
            continue
        e = exp_value + (exp_base if neg_exp_base else 0)
        for j in range(2 ** mant_bit):
            mags.append(2.0 ** e * (1 + j * 2.0 ** (-mant_bit)))
    # exponent zero: mant = B - 2
    mant_bit = value_bit - 2
    for j in range(2 ** mant_bit):
        mags.append(2.0 ** exp_base * (1 + j * 2.0 ** (-mant_bit)))
    # positive exponents: i = 1..B-2, mant = B - i - 2
    for i in range(1, value_bit - 1):
        mant_bit = value_bit - (i + 2)
        for j in range(2 ** mant_bit):
            mags.append(2.0 ** (i + exp_base) * (1 + j * 2.0 ** (-mant_bit)))
    # endpoint +/- 2^(B-1)
    mags.append(2.0 ** (value_bit - 1 + exp_base))
    return mags


def flint_values(bit: int, signed: bool, exp_base: int = 0) -> list[float]:
    """ANT flint grid values (pre-normalization), quant_modules.py:223-278."""
    b = _value_bits(bit, signed)
    assert b >= 2, "flint needs at least 2 value bits"
    mags = _flint_magnitudes(b, exp_base, neg_exp_base=True)
    return [0.0] + _signed_extend(mags, signed)


def ant_grid(mode: str, bit: int, signed: bool) -> np.ndarray:
    """Build a normalized (max == 10.0) ANT grid for one mode.

    The ``float1..float4`` modes map to explicit exponent widths; note that
    the reference's *type search* evaluates all of float1..float4 with
    exp_bit=1 (quant_modules.py:368-402) while its final grid construction
    uses the stated width (quant_modules.py:502-509) — callers that want the
    search behavior should pass mode='float1'.
    """
    if mode == "int":
        vals = int_values(bit, signed)
    elif mode == "pot":
        vals = pot_values(bit, signed)
    elif mode == "apot":
        vals = apot_values(bit, signed)
    elif mode == "float":
        vals = float_values(bit, signed, 3)
    elif mode in ("float1", "float2", "float3", "float4"):
        vals = float_values(bit, signed, int(mode[-1]))
    elif mode == "flint":
        vals = flint_values(bit, signed)
    else:
        raise ValueError(f"unknown ANT mode {mode!r}")
    return ant_normalize(vals, bit)


# ---------------------------------------------------------------------------
# OliVe grids (normal values normalized so the outlier threshold is 32).
# ---------------------------------------------------------------------------

def olive_int_values(bit: int, signed: bool) -> np.ndarray:
    """OliVe int grid, scaled by 32/2^B, sorted, no padding
    (olive_quantization/antquant/quant_modules.py:72-91).

    Unlike ANT's int_value, the OliVe fork does NOT append -2^B: the
    signed grid is symmetric {0, ±1..±(2^B - 1)} (2^bit - 1 entries), so
    the max normal magnitude is 32·(2^B-1)/2^B < 32 and |q| > 32 cleanly
    separates outliers."""
    b = _value_bits(bit, signed)
    values = [0.0] + [float(i) for i in range(1, 2 ** b)]
    if signed:
        values += [float(-i) for i in range(1, 2 ** b)]
    arr = np.sort(np.asarray(values, dtype=np.float64))
    arr = arr * (32.0 / 2 ** b)
    return arr.astype(np.float32)


def olive_flint_values(bit: int, signed: bool, exp_base: int = 0) -> np.ndarray:
    """OliVe flint grid: scaled by 32/2^exp_max so the endpoint is +/-32
    (olive quant_modules.py:94-153). The negative-exponent loop ignores
    exp_base in this variant."""
    b = _value_bits(bit, signed)
    assert b >= 2
    exp_max = (b - 1) + exp_base
    mags = _flint_magnitudes(b, exp_base, neg_exp_base=False)
    vals = [0.0] + _signed_extend(mags, signed)
    arr = np.sort(np.asarray(vals, dtype=np.float64))
    arr = arr * (32.0 / 2 ** exp_max)
    return arr.astype(np.float32)


def olive_outlier_values(bit: int, signed: bool, exp_bit: int = 2,
                         exp_base: int = 5) -> np.ndarray:
    """OliVe "abfloat" outlier grid: +/- 2^i * (1 + j 2^-m) for
    i in [exp_base, exp_base + 2^exp_bit), skipping (i==exp_base, j==0)
    which would collide with the normal-grid endpoint 32
    (olive quant_modules.py:156-179)."""
    b = _value_bits(bit, signed)
    mant_bit = b - exp_bit
    assert mant_bit >= 0
    mags = []
    for i in range(exp_base, exp_base + 2 ** exp_bit):
        for j in range(2 ** mant_bit):
            if i == exp_base and j == 0:
                continue
            mags.append(2.0 ** i * (1 + j * 2.0 ** (-mant_bit)))
    vals = _signed_extend(mags, signed)
    arr = np.sort(np.asarray(vals, dtype=np.float64))
    return arr.astype(np.float32)


def olive_grid(mode: str, bit: int, signed: bool) -> np.ndarray:
    if mode == "int":
        return olive_int_values(bit, signed)
    if mode == "flint":
        return olive_flint_values(bit, signed)
    raise ValueError(f"unknown OliVe mode {mode!r}")


def grid_size(bit: int) -> int:
    """Size of a (padded) ANT grid."""
    return 2 ** bit
