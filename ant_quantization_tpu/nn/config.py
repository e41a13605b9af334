"""Global quantization configuration — the typed equivalent of the
reference's mutable ``quant_args`` dict (ant quant_utils.py:9-12) that is
splatted into every layer constructor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from ..calibrate.spec import SiteConfig


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Framework-wide quantization settings, carried by every quant layer.

    mode/wbit/abit and the search bounds mirror the reference CLIs
    (ImageNet/main.py:20-73, olive run_clm.py:224-277).
    """
    mode: str = "ant-int-pot-flint"
    wbit: int = 4
    abit: int = 4
    family: str = "ant"              # "ant" | "olive"
    w_low: int = 75
    w_up: int = 150
    a_low: int = 75
    a_up: int = 150
    no_outlier: bool = False         # OliVe: disable OVP
    percent: float = 1.0             # GOBO outlier-mode percentile [0,1]
    enabled: bool = True             # master switch (enable_quantization)
    quantize_input: bool = True      # disable_input_quantization
    compute_dtype: Any = jnp.float32  # matmul dtype after fake-quant

    @property
    def scan_step(self) -> int:
        # reference: ANT scans every 1%, OliVe every 2%
        # (quant_modules.py:299 vs olive quant_modules.py:204)
        return 2 if self.family == "olive" else 1

    def weight_site(self, channel_axis: int = -1,
                    pair_axis: int = 0) -> SiteConfig:
        return SiteConfig(
            bit=self.wbit, is_input=False, is_signed=True, mode=self.mode,
            family=self.family, w_low=self.w_low, w_up=self.w_up,
            a_low=self.a_low, a_up=self.a_up, scan_step=self.scan_step,
            no_outlier=self.no_outlier, channel_axis=channel_axis,
            pair_axis=pair_axis, percent=self.percent,
            enabled=self.enabled)

    def input_site(self, pair_axis: int = -1) -> SiteConfig:
        return SiteConfig(
            bit=self.abit, is_input=True, is_signed=False, mode=self.mode,
            family=self.family, w_low=self.w_low, w_up=self.w_up,
            a_low=self.a_low, a_up=self.a_up, scan_step=self.scan_step,
            no_outlier=self.no_outlier, pair_axis=pair_axis,
            percent=self.percent,
            enabled=self.enabled and self.quantize_input)


FP32 = QuantConfig(enabled=False)  # convenience: unquantized baseline
