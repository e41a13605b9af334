"""Accelerator cycle/energy model: numpy implementation vs native C++
tileopt, and (when the reference tree is available) both vs the reference
BitFusion-derived optimizer run in-process as an oracle."""

import os
import sys

import numpy as np
import pytest

from ant_quantization_tpu.perfmodel.energy import CONFIGS, energy_params
from ant_quantization_tpu.perfmodel.model import conv_cycles, fc_cycles
from ant_quantization_tpu.perfmodel.simulator import (ConvSpec, MatMulSpec,
                                                      Simulator)

REF = "/root/reference/ant_simulator"

CASES = [
    # K, O, S, IC, OC, iprec, wprec, B
    (3, 56, 1, 64, 64, 4, 4, 4),
    (7, 112, 2, 3, 64, 8, 8, 4),
    (1, 28, 1, 256, 512, 4, 4, 2),
    (3, 14, 2, 256, 512, 4, 8, 1),
]

FC_CASES = [
    (768, 3072, 4, 4, 128),
    (25088, 4096, 4, 4, 1),
]


def _ref_optimize(acc_cfg, energy, K, O, S, IC, OC, B, iprec, wprec,
                  ws=False):
    sys.path.insert(0, REF)
    try:
        from bitfusion.src.optimizer.optimizer import (_optimize_for_order,
                                                       get_stats_fast)
        from bitfusion.src.simulator.accelerator import Accelerator
        from itertools import permutations

        sram = {"act": acc_cfg.sram_act, "wgt": acc_cfg.sram_wgt,
                "out": acc_cfg.sram_out}
        acc = Accelerator(acc_cfg.n, acc_cfg.m, acc_cfg.pmax, acc_cfg.pmin,
                          sram, acc_cfg.mem_if_width, acc_cfg.frequency)
        conv_params = (acc, K, O, S, IC, OC, B, iprec, wprec, True, ws,
                       energy)
        best = None
        for order in set(permutations(
                ["B/b", "OW/ow", "OH/oh", "IC/ic", "OC/oc"])):
            tiling, order_type, cycles, en = _optimize_for_order(
                conv_params, order)
            if cycles is None:
                continue
            if best is None or best[0] > cycles or (best[0] == cycles
                                                    and best[1] > en):
                best = (cycles, en, tiling, order_type)
        stats = get_stats_fast(conv_params, best[2], best[3])
        return stats
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("case", CASES)
def test_numpy_matches_native(case):
    K, O, S, IC, OC, iprec, wprec, B = case
    acc = CONFIGS["ant"]
    e = energy_params(acc)
    st_np = conv_cycles(acc, K, O, S, IC, OC, iprec, wprec, B, False, e)
    sim = Simulator(acc, e, use_native=True)
    assert sim.use_native, "csrc/libtileopt.so not built (make -C csrc)"
    st_cc = sim.conv(ConvSpec(K, O, S, IC, OC, iprec, wprec), B)
    assert st_np.total_cycles == st_cc.total_cycles
    assert st_np.mem_stall_cycles == st_cc.mem_stall_cycles
    for ns in ("act", "wgt", "out", "dram"):
        assert st_np.reads[ns] == st_cc.reads[ns], ns
        assert st_np.writes[ns] == st_cc.writes[ns], ns


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("ws", [False, True])
def test_matches_reference_oracle(case, ws):
    K, O, S, IC, OC, iprec, wprec, B = case
    acc = CONFIGS["ant"]
    e = energy_params(acc)
    ref = _ref_optimize(acc, e, K, O, S, IC, OC, B, iprec, wprec, ws)
    mine = conv_cycles(acc, K, O, S, IC, OC, iprec, wprec, B, ws, e)
    assert mine.total_cycles == ref.total_cycles
    assert mine.mem_stall_cycles == ref.mem_stall_cycles
    for ns in ("act", "wgt", "out", "dram"):
        assert mine.reads[ns] == ref.reads[ns], f"reads {ns}"
        assert mine.writes[ns] == ref.writes[ns], f"writes {ns}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.parametrize("fc", FC_CASES)
def test_fc_matches_reference_oracle(fc):
    ni, no, iprec, wprec, rows = fc
    acc = CONFIGS["ant"]
    e = energy_params(acc)
    ref = _ref_optimize(acc, e, 1, 1, 1, ni, no, rows, iprec, wprec)
    mine = fc_cycles(acc, ni, no, iprec, wprec, rows, False, e)
    assert mine.total_cycles == ref.total_cycles


def test_precision_scaling():
    """4-bit ops on the 8/4 array run ~4x faster than 8-bit (the BitFusion
    perf factor, accelerator.py:69-76)."""
    acc = CONFIGS["ant"]
    st8 = conv_cycles(acc, 3, 56, 1, 128, 128, 8, 8, 4)
    st4 = conv_cycles(acc, 3, 56, 1, 128, 128, 4, 4, 4)
    ratio = st8.total_cycles / st4.total_cycles
    assert 2.5 < ratio <= 4.5, ratio


def test_energy_params_match_reference_derivation():
    e = energy_params(CONFIGS["ant"])
    # wbuf read: 0.0168924 nJ / 512-bit access
    assert e.wbuf_read_energy == pytest.approx(0.0168924 / 512)
    assert e.obuf_write_energy == pytest.approx(0.000415925 / 32)
    # core: 279960 nW/PE * 1024 PEs / 500 MHz
    assert e.core_dynamic_energy == pytest.approx(279960 * 1024 / 5e8)


def test_network_aggregation():
    sim = Simulator.named("ant")
    layers = [ConvSpec(3, 56, 1, 64, 64, 4, 4),
              MatMulSpec(512, 1000, 8, 8)]
    total = sim.network(layers, batch=4)
    assert total.total_cycles > 0
    e = energy_params(CONFIGS["ant"])
    assert total.energy(e) > 0
    static, dram, sram, core = total.energy_breakdown(e)
    assert all(v > 0 for v in (static, dram, sram, core))
