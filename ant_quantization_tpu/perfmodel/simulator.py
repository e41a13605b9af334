"""Simulator facade: layer specs -> cycles/energy via the native C++ tiling
optimizer (csrc/tileopt.cc) with the vectorized numpy model as fallback.

Equivalent of bitfusion.src.simulator.Simulator.get_cycles
(simulator.py:492-521): convolutions and matmuls dispatch to the tiling
search; matmul = 1x1 conv with batch = rows.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .energy import CONFIGS, energy_params
from .model import (AcceleratorConfig, EnergyParams, LayerStats, conv_cycles,
                    fc_cycles)

_LIB = None
_TRIED = False


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """One conv layer: square kernel/output, same precision column layout
    as the reference bench tables."""
    k: int
    out: int          # output spatial size O
    stride: int
    ic: int
    oc: int
    iprec: int
    wprec: int
    name: str = ""


@dataclasses.dataclass(frozen=True)
class MatMulSpec:
    ni: int
    no: int
    iprec: int
    wprec: int
    rows: int = 1     # batch x seq collapsing, like dnnweaver2 MatMul B dim
    name: str = ""


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "csrc", "libtileopt.so")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.tileopt_conv.restype = ctypes.c_int
        lib.tileopt_conv.argtypes = [ctypes.c_longlong] * 8 + \
            [ctypes.c_longlong] * 8 + [ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_double),
                                       ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
    return _LIB


class Simulator:
    def __init__(self, acc: AcceleratorConfig,
                 energy: Optional[EnergyParams] = None,
                 use_native: bool = True):
        self.acc = acc
        self.energy = energy or energy_params(acc)
        self.use_native = use_native and _lib() is not None

    @classmethod
    def named(cls, name: str, **kw) -> "Simulator":
        return cls(CONFIGS[name], **kw)

    def _conv_native(self, K, O, S, IC, OC, B, iprec, wprec,
                     ws: bool) -> LayerStats:
        e = self.energy
        ep = (ctypes.c_double * 9)(
            e.core_leak_energy, e.core_dynamic_energy,
            e.wbuf_read_energy, e.wbuf_write_energy,
            e.ibuf_read_energy, e.ibuf_write_energy,
            e.obuf_read_energy, e.obuf_write_energy,
            e.sram_leak_energy)
        out = (ctypes.c_double * 10)()
        a = self.acc
        rc = _lib().tileopt_conv(
            a.n, a.m, a.pmax, a.pmin, a.sram_act, a.sram_wgt, a.sram_out,
            a.mem_if_width, K, O, S, IC, OC, B, iprec, wprec, int(ws),
            ep, out)
        assert rc == 0, "no feasible tiling"
        return LayerStats(
            int(out[0]), int(out[1]),
            {"act": int(out[2]), "wgt": int(out[3]), "out": int(out[4]),
             "dram": int(out[5])},
            {"act": int(out[6]), "wgt": int(out[7]), "out": int(out[8]),
             "dram": int(out[9])})

    def conv(self, s: ConvSpec, batch: int,
             weight_stationary: bool = False) -> LayerStats:
        if self.use_native:
            return self._conv_native(s.k, s.out, s.stride, s.ic, s.oc,
                                     batch, s.iprec, s.wprec,
                                     weight_stationary)
        return conv_cycles(self.acc, s.k, s.out, s.stride, s.ic, s.oc,
                           s.iprec, s.wprec, batch,
                           weight_stationary, self.energy)

    def matmul(self, s: MatMulSpec, batch: int,
               weight_stationary: bool = False) -> LayerStats:
        rows = s.rows * batch
        if self.use_native:
            return self._conv_native(1, 1, 1, s.ni, s.no, rows,
                                     s.iprec, s.wprec, weight_stationary)
        return fc_cycles(self.acc, s.ni, s.no, s.iprec, s.wprec, rows,
                         weight_stationary, self.energy)

    def network(self, layers: Sequence, batch: int,
                weight_stationary: bool = False) -> LayerStats:
        total = None
        for layer in layers:
            if isinstance(layer, ConvSpec):
                st = self.conv(layer, batch, weight_stationary)
            else:
                st = self.matmul(layer, batch, weight_stationary)
            total = st if total is None else total + st
        return total
