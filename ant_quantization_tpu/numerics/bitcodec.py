"""Bit-level storage codecs: flint codewords and OVP pair packing.

The reference never materializes real encodings — its CUDA kernel
fake-quantizes to f32 values and the papers' bit formats live only in the
(simulated) accelerator. A serving framework that stores real quantized
weights needs them as first-class, invertible codecs:

- **flint** (ANT's adaptive type): B-bit codewords with a variable-length
  exponent and the mantissa in the remaining bits. Following the
  generator's bit budgets (quant_modules.py:223-278: exponent e costs
  |e|+1 bits for e<0, e+2 bits for e>=0, mantissa gets the rest), the
  exponent is stored as a unary prefix — e < 0 as |e| zeros then a
  one ("leading-1-terminated"), e >= 0 as e+1 ones then a zero — making
  every codeword self-delimiting: scan bits until the first flip, the
  count gives |e| and the first bit gives its sign. Signed formats spend
  the top bit on sign. The codec is exercised as data (codeword tables),
  which is how a TPU consumes it: decode happens by LUT/select against
  the table, not per-element bit twiddling.

- **OVP** (OliVe): values pack two 4-bit codes per aligned byte; an
  outlier spends its victim's nibble, so the byte holds the 4-bit abfloat
  index in the outlier's slot and the victim slot is free to carry the
  outlier's sign + a marker. A 1-bit-per-pair mask (packed bytes,
  SMEM-resident at kernel time) says which pairs are outlier pairs —
  the TPU-native stand-in for the accelerator's in-band identifier.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = ["flint_codewords", "flint_decode_table", "ovp_pack",
           "ovp_unpack", "pack_w4_stack", "unpack_w4_stack"]


# ---------------------------------------------------------------------------
# flint codewords
# ---------------------------------------------------------------------------

def _flint_entries(value_bit: int) -> List[Tuple[int, int, int]]:
    """(exp, mant_bits, mant) for every magnitude of a flint format with
    ``value_bit`` bits after the sign (generator loop order)."""
    out = []
    neg = value_bit - 1
    pos = value_bit - 1
    for i in range(0, neg + 1):                    # e = -(i+1)
        exp_bits = i + 2
        e = -(i + 1)
        mant_bits = value_bit - exp_bits
        for m in range(int(2 ** mant_bits)):       # <0 mant bits: empty
            out.append((e, mant_bits, m))
    exp_bits = 2                                   # e = 0
    mant_bits = value_bit - exp_bits
    for m in range(2 ** mant_bits):
        out.append((0, mant_bits, m))
    for e in range(1, pos):                        # e > 0
        exp_bits = e + 2
        mant_bits = value_bit - exp_bits
        for m in range(2 ** mant_bits):
            out.append((e, mant_bits, m))
    out.append((pos, 0, 0))                        # endpoint 2^pos
    return out


def _exp_prefix(e: int, e_max: int) -> str:
    """Unary exponent prefix: e<0 -> |e| zeros + '1'; e>=0 -> (e+1) ones
    then a terminating '0' unless the run already fills the budget
    (e = e_max, the endpoint, needs no terminator)."""
    if e < 0:
        return "0" * (-e) + "1"
    ones = "1" * (e + 1)
    return ones if e + 1 >= e_max + 1 else ones + "0"


def flint_codewords(bit: int, signed: bool = True) -> Dict[str, float]:
    """codeword-bitstring -> value for a ``bit``-wide flint format.

    Every codeword is exactly ``bit`` bits (sign + exponent prefix +
    mantissa); the mapping is a bijection onto the flint grid magnitudes
    (plus 0, encoded as all-zeros with a sign bit of 0)."""
    value_bit = bit - 1 if signed else bit
    e_max = value_bit - 1
    table: Dict[str, float] = {}

    def put(sign_bit: str, body: str, value: float):
        word = sign_bit + body if signed else body
        assert len(word) == bit, (word, bit)
        assert word not in table, word
        table[word] = value

    zero_body = "0" * value_bit
    put("0", zero_body, 0.0) if signed else put("", zero_body, 0.0)
    for e, mant_bits, m in _flint_entries(value_bit):
        prefix = _exp_prefix(e, e_max)
        body = prefix + format(m, f"0{mant_bits}b") if mant_bits else prefix
        # the all-zeros body is reserved for 0: the e=-(value_bit-1)
        # prefix "0..01" never collides with it
        assert len(body) == value_bit, (e, mant_bits, body)
        mag = (2.0 ** e) * (1 + m * 2.0 ** -mant_bits) if mant_bits \
            else 2.0 ** e
        if signed:
            put("0", body, mag)
            put("1", body, -mag)
        else:
            put("", body, mag)
    return table


def flint_decode_table(bit: int, signed: bool = True) -> np.ndarray:
    """(2^bit,) decode LUT: value of each codeword interpreted as an
    integer (missing codewords, if any, decode to 0)."""
    table = flint_codewords(bit, signed)
    lut = np.zeros(2 ** bit, np.float64)
    for word, value in table.items():
        lut[int(word, 2)] = value
    return lut


# ---------------------------------------------------------------------------
# OVP pair packing
# ---------------------------------------------------------------------------

def ovp_pack(normal_codes: np.ndarray, outlier_codes: np.ndarray,
             outlier_mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-element 4-bit codes into aligned pair bytes.

    normal_codes:  (N,) uint8 in [0,16) — index into the normal grid
    outlier_codes: (N,) uint8 in [0,16) — index into the abfloat grid
                   (only meaningful where outlier_mask)
    outlier_mask:  (N,) bool — at most one True per aligned pair (the
                   OVP guarantee: the partner is the zeroed victim)

    Returns (packed (N//2,) uint8, sideband (ceil(N/8),) uint8):
    a normal pair byte is [even | odd<<4]; an outlier pair byte carries
    the abfloat index in the outlier's own nibble and 0 in the victim's.
    The sideband spends 2 bits per pair — 00 normal, 10 even-slot
    outlier, 11 odd-slot outlier — i.e. 1/8 extra byte per pair, the
    TPU-native stand-in for the accelerator's in-band identifier.
    """
    n = normal_codes.shape[0]
    assert n % 2 == 0
    mask = outlier_mask.astype(bool)
    even_o, odd_o = mask[0::2], mask[1::2]
    assert not (even_o & odd_o).any(), "OVP: both slots outlier"
    pair_out = even_o | odd_o
    lo = np.where(even_o, outlier_codes[0::2],
                  np.where(odd_o, 0, normal_codes[0::2]))
    hi = np.where(odd_o, outlier_codes[1::2],
                  np.where(even_o, 0, normal_codes[1::2]))
    packed = lo.astype(np.uint8) | (hi.astype(np.uint8) << 4)
    side = np.stack([pair_out, odd_o], axis=1).astype(np.uint8).ravel()
    return packed, np.packbits(side, bitorder="little")


def ovp_unpack(packed: np.ndarray, sideband: np.ndarray,
               n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of ovp_pack -> (normal_codes, outlier_codes, outlier_mask);
    victims come back as normal code 0 (their value was sacrificed)."""
    n_pairs = n // 2
    side = np.unpackbits(sideband, bitorder="little")[:2 * n_pairs]
    pair_out = side[0::2].astype(bool)
    odd_o = side[1::2].astype(bool) & pair_out
    even_o = pair_out & ~odd_o
    lo = packed & 0xF
    hi = packed >> 4
    normal = np.zeros(n, np.uint8)
    outlier = np.zeros(n, np.uint8)
    mask = np.zeros(n, bool)
    normal[0::2] = np.where(pair_out, 0, lo)
    normal[1::2] = np.where(pair_out, 0, hi)
    outlier[0::2] = np.where(even_o, lo, 0)
    outlier[1::2] = np.where(odd_o, hi, 0)
    mask[0::2] = even_o
    mask[1::2] = odd_o
    return normal, outlier, mask


# ---------------------------------------------------------------------------
# Engine checkpoint codec: stacked w4 weight stores at true 4-bit density
# ---------------------------------------------------------------------------

def pack_w4_stack(w_i8: np.ndarray, ovp: bool,
                  pair_axis: int = 0) -> Dict[str, np.ndarray]:
    """Pack a stacked (L, K, N) "w4" weight store (int8 codebook values,
    or sign-offset OVP bytes) into true 4-bit density for on-disk engine
    checkpoints (tools/serve_cli.py --save_engine): per-layer 16-entry
    value tables + two codes per byte via :func:`ovp_pack` — ~0.56x the
    int8 bytes (codes/2 + sideband/8 + tables).

    ``ovp`` marks sign-offset stores (serve/engine.py OVP sites): bytes
    with \\|v\\| > 64 are abfloat outliers and index a second per-layer
    table; their zeroed victims ride as normal code of value 0. The OVP
    pair guarantee (at most one outlier per aligned pair) holds along
    ``pair_axis`` of (K, N) — quantize_weights_ovp_i8's axis — so each
    layer is flattened with that axis minor before pairing.
    """
    L, K, N = w_i8.shape
    if ovp:
        # pairs are aligned (even, odd) positions along pair_axis; an
        # odd length would make flattened pairs straddle row boundaries
        # and the victim fix-up in unpack_w4_stack would then zero a
        # genuine weight of the neighboring row — refuse loudly
        pair_len = K if pair_axis == 0 else N
        if pair_len % 2:
            raise ValueError(
                f"OVP pair packing needs an even pair-axis length; "
                f"axis {pair_axis} of (K={K}, N={N}) is odd")
    packed, side, ntab, otab = [], [], [], []
    any_outlier = False
    for l in range(L):
        w = w_i8[l]
        if pair_axis == 0:
            w = w.T                       # pairs along K -> flat-adjacent
        flat = np.ascontiguousarray(w).ravel()
        mask = (np.abs(flat.astype(np.int32)) > 64) if ovp \
            else np.zeros(flat.shape, bool)
        nv = np.unique(flat[~mask])
        ov = np.unique(flat[mask]) if mask.any() else np.zeros(0, np.int8)
        assert nv.size <= 16 and ov.size <= 16, (nv.size, ov.size)
        ncodes = np.searchsorted(nv, flat).astype(np.uint8)
        ocodes = (np.searchsorted(ov, flat).clip(0, max(ov.size - 1, 0))
                  .astype(np.uint8))
        p, s = ovp_pack(np.where(mask, 0, ncodes), ocodes, mask)
        packed.append(p)
        side.append(s)
        any_outlier = any_outlier or bool(mask.any())
        ntab.append(np.pad(nv.astype(np.int8), (0, 16 - nv.size),
                           mode="edge" if nv.size else "constant"))
        otab.append(np.pad(ov.astype(np.int8), (0, 16 - ov.size))
                    if ov.size else np.zeros(16, np.int8))
    # outlier-free stacks (plain ANT sites) drop the 1-bit/element
    # sideband entirely: 0.50x instead of 0.625x (the key is simply
    # absent — zero-size arrays break checkpoint writers)
    out = {"w4_packed": np.stack(packed),
           "w4_ntab": np.stack(ntab), "w4_otab": np.stack(otab),
           "w4_shape": np.asarray([L, K, N, pair_axis], np.int32)}
    if any_outlier:
        out["w4_side"] = np.stack(side)
    return out


def unpack_w4_stack(d: Dict[str, np.ndarray]) -> np.ndarray:
    """Inverse of :func:`pack_w4_stack` -> the exact (L, K, N) int8."""
    L, K, N, pair_axis = (int(x) for x in np.asarray(d["w4_shape"]))
    out = np.empty((L, K, N), np.int8)
    if "w4_side" in d:
        side = np.asarray(d["w4_side"])
    else:                                      # outlier-free: no sideband
        side = np.zeros((L, -(-K * N // 8)), np.uint8)
    for l in range(L):
        ncodes, ocodes, mask = ovp_unpack(
            np.asarray(d["w4_packed"][l]), side[l], K * N)
        vals = np.asarray(d["w4_ntab"][l])[ncodes]
        if mask.any():
            vals = np.where(mask, np.asarray(d["w4_otab"][l])[ocodes],
                            vals)
            # the outlier's pair partner is its zeroed victim (sign-offset
            # stores it as byte 0); ovp_unpack returns code 0 for it,
            # which would otherwise decode to ntab[0]
            m2 = mask.reshape(-1, 2)
            victim = (m2.any(axis=1)[:, None] & ~m2).ravel()
            vals = np.where(victim, 0, vals)
        w = vals.astype(np.int8)
        out[l] = w.reshape(N, K).T if pair_axis == 0 else w.reshape(K, N)
    return out
