"""Quantization state and static site configuration.

The reference keeps calibration state as mutable buffers inside each torch
module (alpha Parameter, quant_grid/bit/has_inited buffers — ant
quant_modules.py:39-42). Here it is an explicit, immutable pytree: data that
can be checkpointed, sharded, and rebuilt by a jitted calibration step.

Shapes are kept static across 4-bit and 8-bit so that mixed-precision
promotion (set_8_bit_layer_n) is a pure pytree transform, not a re-trace:
grids are padded to ``GRID_PAD`` entries by repeating the maximum value
(snap semantics are invariant to duplicated entries) and ``bit`` is a
dynamic scalar.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..numerics import codebooks as cb

# Fixed storage sizes so 4- and 8-bit states share one pytree structure.
GRID_PAD = 256          # 2^8, the largest grid the reference supports
OUTLIER_PAD = 256       # OliVe abfloat grid (<=254 entries at 8-bit)


@struct.dataclass
class QuantState:
    """Calibrated state of one tensor quantizer (pytree of arrays)."""
    alpha: jax.Array        # () per-tensor or (C,) per-channel clip scale
    grid: jax.Array         # (GRID_PAD,) integer-domain codebook, sorted,
                            # padded by repeating the max entry
    outliers: jax.Array     # (OUTLIER_PAD,) OliVe outlier grid (zeros-padded
                            # ANT states carry an unused placeholder)
    bit: jax.Array          # () int32: 4/6/8 — dynamic for promotion
    mode_idx: jax.Array     # () int32 index into SiteConfig.modes
    is_signed: jax.Array    # () bool
    mse: jax.Array          # () float32 calibration MSE (promotion ranking)
    initialized: jax.Array  # () bool
    aux: jax.Array          # () float32: absmax threshold for the GOBO
                            # "outlier" baseline mode (unused otherwise)


@dataclasses.dataclass(frozen=True)
class SiteConfig:
    """Static (trace-time) configuration of one quantizer site.

    Mirrors the constructor args + global quant_args of the reference
    Quantizer (quant_modules.py:28-58) minus anything data-dependent.
    """
    bit: int = 4                      # default bit-width (pre-promotion)
    is_input: bool = False            # activations: per-tensor, unsigned init
    is_signed: bool = True            # initial signedness (may flip up)
    mode: str = "ant-int-pot-flint"   # mode string, reference CLI semantics
    family: str = "ant"               # "ant" | "olive"
    # alpha-scan bounds, in percent (w_* for weights, a_* for inputs)
    w_low: int = 75
    w_up: int = 150
    a_low: int = 75
    a_up: int = 150
    scan_step: int = 1                # reference: 1 for ANT, 2 for OliVe
    no_outlier: bool = False          # OliVe: disable OVP + 3-sigma init
    channel_axis: int = -1            # weight per-channel axis (flax: out)
    pair_axis: int = 0                # OVP pairing axis (flax kernel: in)
    percent: float = 1.0              # GOBO outlier-mode percentile [0,1]
    enabled: bool = True

    @property
    def candidate_modes(self) -> Tuple[str, ...]:
        """Candidate numeric types in the reference's search order
        (quant_modules.py:328-415). Non-adaptive modes are themselves."""
        if self.mode.startswith("ant-"):
            return tuple(m for m in cb.ANT_MODES if f"-{m}" in self.mode)
        return (self.mode,)

    @property
    def low(self) -> int:
        return self.a_low if self.is_input else self.w_low

    @property
    def up(self) -> int:
        return self.a_up if self.is_input else self.w_up

    @property
    def per_channel(self) -> bool:
        # "Input shouldn't be per-channel quantization" (quant_modules.py:51)
        return not self.is_input

    @property
    def use_ovp(self) -> bool:
        return self.family == "olive" and not self.no_outlier


def pad_grid(grid: np.ndarray, size: int = GRID_PAD) -> np.ndarray:
    """Pad a sorted grid to ``size`` by repeating its maximum entry; snap
    results are unchanged by duplicate entries."""
    assert grid.shape[0] <= size, f"grid of {grid.shape[0]} exceeds pad {size}"
    return np.pad(grid, (0, size - grid.shape[0]), mode="edge")


def placeholder_state(num_channels: Optional[int]) -> QuantState:
    """Uninitialized state (pre-calibration)."""
    alpha = jnp.ones((num_channels,) if num_channels else ())
    return QuantState(
        alpha=alpha,
        grid=jnp.ones((GRID_PAD,), jnp.float32),
        outliers=jnp.zeros((OUTLIER_PAD,), jnp.float32),
        bit=jnp.asarray(0, jnp.int32),
        mode_idx=jnp.asarray(0, jnp.int32),
        is_signed=jnp.asarray(False),
        mse=jnp.asarray(0.0, jnp.float32),
        initialized=jnp.asarray(False),
        aux=jnp.asarray(0.0, jnp.float32),
    )
