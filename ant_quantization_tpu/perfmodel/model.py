"""Analytic cycle/energy model of the ANT accelerator family.

Re-implementation of the BitFusion-derived simulator the reference ships
(ant_simulator/bitfusion/src/): a precision-scalable N x M systolic array
with act/wgt/out SRAMs (double-buffered), a 1024-bit memory interface, and
an exhaustive tiling + loop-order search. The math is identical
(accelerator.py:69-130 compute formulas, optimizer.py:34-206 SRAM promotion
walk + stall model, stats.py:58-112 energy); the *implementation* is a
vectorized numpy sweep over the full (order x tiling) cross product instead
of a multiprocessing pool over 120 Python loop nests — ~100x faster with no
worker processes.

Quirk preserved bug-for-bug: the read-promotion walk records
``max_read_size = writes[ns]`` (optimizer.py:137), so a promoted 'out' read
contributes 0 to the final-DRAM-write latency term.
"""

from __future__ import annotations

import dataclasses
import math
from itertools import permutations
from typing import Dict, Optional, Tuple

import numpy as np

LOOPS = ("B/b", "OW/ow", "OH/oh", "IC/ic", "OC/oc")
# whether each tile loop forces re-reads of act/wgt/out (optimizer.py:18-23)
TILE_DEPS = {
    "B/b": (True, False, True),
    "OW/ow": (True, False, True),
    "OH/oh": (True, False, True),
    "IC/ic": (True, True, False),
    "OC/oc": (False, True, True),
}
OPREC = 16  # accumulator bits counted by the stats model (optimizer.py:63)


@dataclasses.dataclass(frozen=True)
class EnergyParams:
    """pJ-scale per-event costs (EnergyTuple, simulator/energy.py)."""
    core_leak_energy: float
    core_dynamic_energy: float
    wbuf_read_energy: float
    wbuf_write_energy: float
    ibuf_read_energy: float
    ibuf_write_energy: float
    obuf_read_energy: float
    obuf_write_energy: float
    sram_leak_energy: float


@dataclasses.dataclass(frozen=True)
class AcceleratorConfig:
    """Geometry from the reference's conf_*.ini files."""
    n: int = 32                 # systolic rows (inputs)
    m: int = 32                 # systolic cols (outputs)
    pmax: int = 8
    pmin: int = 4
    sram_act: int = 262144      # bytes
    sram_wgt: int = 131072
    sram_out: int = 131072
    mem_if_width: int = 1024    # bits
    frequency: int = 500_000_000

    def perf_factor(self, prec: int) -> int:
        return int(self.pmax / max(prec, self.pmin))


@dataclasses.dataclass
class LayerStats:
    total_cycles: int
    mem_stall_cycles: int
    reads: Dict[str, int]
    writes: Dict[str, int]

    def energy(self, e: EnergyParams) -> float:
        """stats.py:58-80 (absolute scale follows the reference)."""
        dram_leak = 3838.05 / 500000
        dram_rd = 1.18294 / 1024
        dram_wr = 1.47797 / 1024
        dyn = self.total_cycles * (e.core_leak_energy + e.sram_leak_energy
                                   + dram_leak)
        dyn += (self.total_cycles - self.mem_stall_cycles) \
            * e.core_dynamic_energy
        dyn += self.reads["wgt"] * e.wbuf_read_energy
        dyn += self.writes["wgt"] * e.wbuf_write_energy
        dyn += self.reads["act"] * e.ibuf_read_energy
        dyn += self.writes["act"] * e.ibuf_write_energy
        dyn += self.reads["out"] * e.obuf_read_energy
        dyn += self.writes["out"] * e.obuf_write_energy
        dyn += self.reads["dram"] * dram_rd
        dyn += self.writes["dram"] * dram_wr
        return dyn

    def energy_breakdown(self, e: EnergyParams) -> Tuple[float, float,
                                                         float, float]:
        """(static, dram, sram, core), stats.py:84-112."""
        dram_leak = 484.615 / 500
        dram_rd = 0.644304 / 1024
        dram_wr = 0.784104 / 1024
        core = self.total_cycles * e.core_leak_energy
        core += (self.total_cycles - self.mem_stall_cycles) \
            * e.core_dynamic_energy
        sram = (self.reads["wgt"] * e.wbuf_read_energy
                + self.writes["wgt"] * e.wbuf_write_energy
                + self.reads["act"] * e.ibuf_read_energy
                + self.writes["act"] * e.ibuf_write_energy
                + self.reads["out"] * e.obuf_read_energy
                + self.writes["out"] * e.obuf_write_energy)
        dram = (self.reads["dram"] * dram_rd
                + self.writes["dram"] * dram_wr)
        static = self.total_cycles * dram_leak
        return static, dram, sram, core

    def __add__(self, other: "LayerStats") -> "LayerStats":
        return LayerStats(
            self.total_cycles + other.total_cycles,
            self.mem_stall_cycles + other.mem_stall_cycles,
            {k: self.reads[k] + other.reads[k] for k in self.reads},
            {k: self.writes[k] + other.writes[k] for k in self.writes})


def _pow2_choices(limit: int, cap: int) -> np.ndarray:
    n = int(math.ceil(math.log2(limit))) + 1 if limit > 1 else 1
    return np.minimum(1 << np.arange(n), cap)


def _ceil(a, b):
    return -(-a // b)


def conv_cycles(acc: AcceleratorConfig, K: int, O: int, S: int, IC: int,
                OC: int, iprec: int, wprec: int, B: int,
                weight_stationary: bool = False,
                energy: Optional[EnergyParams] = None) -> LayerStats:
    """Exhaustive tiling + loop-order search, vectorized.

    Returns the best-cycles (tie: best-energy) LayerStats, matching
    Simulator.get_conv_cycles (simulator.py:415-490, im2col=True).
    """
    pf_i, pf_w = acc.perf_factor(iprec), acc.perf_factor(wprec)

    # candidate tile sizes (optimizer.py:386-433; im2col keeps OC raw pow2)
    bs = _pow2_choices(B, B)
    os_ = _pow2_choices(O, O)
    ics = _pow2_choices(IC, IC)
    ocs = _pow2_choices(OC, OC)

    b, ow, ic, oc = [g.reshape(-1) for g in
                     np.meshgrid(bs, os_, ics, ocs, indexing="ij")]
    oh = ow
    num_b, num_ow, num_ic, num_oc = (_ceil(B, b), _ceil(O, ow),
                                     _ceil(IC, ic), _ceil(OC, oc))
    num_oh = num_ow
    nums = {"B/b": num_b, "OW/ow": num_ow, "OH/oh": num_oh,
            "IC/ic": num_ic, "OC/oc": num_oc}

    # initial per-tile SRAM footprints in bits (optimizer.py:54-65)
    w_wgt0 = (_ceil(K * K * ic, acc.n * pf_w) * acc.n * pf_w * oc * wprec)
    w_act0 = (ow * oh * _ceil(K * K * ic, acc.m * pf_i) * acc.m * pf_i
              * b * iprec)
    r_out0 = ow * oh * oc * b * OPREC

    cap_wgt = acc.sram_wgt * 8 / 2
    cap_act = acc.sram_act * 8 / 2
    cap_out = acc.sram_out * 8 / 2
    valid = (w_wgt0 <= cap_wgt) & (w_act0 <= cap_act)  # w_out0 == 0

    # compute cycles per tile (accelerator.py:98-126, im2col)
    ni = K * K * ic
    no = oc
    batch = b * oh * ow
    if weight_stationary:
        tile_cycles = batch * _ceil(no, acc.m * pf_w) * _ceil(ni, acc.n * pf_i)
    else:
        tile_cycles = (_ceil(batch, acc.n * pf_i)
                       * _ceil(no, acc.m * pf_w) * ni)
    num_tiles = num_b * num_ow * num_oh * num_ic * num_oc
    compute_cycles = num_tiles * tile_cycles

    # per-tile SRAM traffic (optimizer.py:162-175)
    if weight_stationary:
        sr_act = num_tiles * (K * K * ic * oc) * (b * ow * oh) * iprec
        sr_out_r = num_tiles * (K * K * ic * oc) * (b * ow * oh) * OPREC
        sw_out = sr_out_r
        sr_wgt = num_tiles * (K * K * ic * oc) * wprec
    else:
        sr_act = num_tiles * (oc * oh * ow * b) * (K * K * ic) * iprec
        sw_out = num_tiles * (oc * oh * ow * b) * OPREC
        sr_wgt = num_tiles * (oc * oh * ow * b) * (K * K * ic) * wprec
        sr_out_r = num_tiles * (oc * oh * ow * b) * OPREC

    best = None  # (cycles, energy, stats-dict)
    caps = {"wgt": cap_wgt, "act": cap_act, "out": cap_out}
    for order in permutations(LOOPS):
        # SRAM promotion walk (optimizer.py:109-149), vectorized over tilings
        writes = {"wgt": w_wgt0.astype(np.float64),
                  "act": w_act0.astype(np.float64),
                  "out": np.zeros_like(w_wgt0, np.float64)}
        reads = {"out": r_out0.astype(np.float64)}
        max_w = {k: v.copy() for k, v in writes.items()}
        max_r = {k: v.copy() for k, v in reads.items()}
        w_prom = {k: np.ones_like(valid) for k in writes}
        r_prom = {"out": np.ones_like(valid)}
        for loop in reversed(order):
            nt = nums[loop]
            dep_act, dep_wgt, dep_out = TILE_DEPS[loop]
            deps = {"act": dep_act, "wgt": dep_wgt, "out": dep_out}
            for ns in writes:
                grow = writes[ns] * nt
                writes[ns] = np.where(w_prom[ns] & (not deps[ns]),
                                      writes[ns], grow)
                newly_over = w_prom[ns] & deps[ns] & (grow > caps[ns])
                ok = w_prom[ns] & deps[ns] & ~newly_over
                max_w[ns] = np.where(ok, grow, max_w[ns])
                w_prom[ns] = w_prom[ns] & ~newly_over
            for ns in reads:
                grow = reads[ns] * nt
                reads[ns] = np.where(r_prom[ns] & (not deps[ns]),
                                     reads[ns], grow)
                newly_over = r_prom[ns] & deps[ns] & (grow > caps[ns])
                ok = r_prom[ns] & deps[ns] & ~newly_over
                # reference quirk: records *writes*, not reads
                max_r[ns] = np.where(ok, writes[ns], max_r[ns])
                r_prom[ns] = r_prom[ns] & ~newly_over

        dram_r = writes["wgt"] + writes["act"] + writes["out"]
        dram_w = reads["out"]
        initial = max_w["wgt"] + max_w["act"] + max_w["out"]
        final = max_r["out"]
        latency = _ceil(initial, acc.mem_if_width) \
            + _ceil(final, acc.mem_if_width)
        middle = dram_r + dram_w - initial - final
        mem_cycles = _ceil(middle, acc.mem_if_width)
        stalls = np.maximum(0, mem_cycles - compute_cycles) + latency
        total = compute_cycles + stalls

        total = np.where(valid, total, np.inf)
        if energy is not None:
            e = energy
            dram_leak = 3838.05 / 500000
            en = total * (e.core_leak_energy + e.sram_leak_energy + dram_leak)
            en = en + (total - stalls) * e.core_dynamic_energy
            en = en + (sr_wgt * e.wbuf_read_energy
                       + writes["wgt"] * e.wbuf_write_energy
                       + sr_act * e.ibuf_read_energy
                       + writes["act"] * e.ibuf_write_energy
                       + (sr_out_r + reads["out"]) * e.obuf_read_energy
                       + (sw_out + writes["out"]) * e.obuf_write_energy)
            en = en + dram_r * (1.18294 / 1024) + dram_w * (1.47797 / 1024)
        else:
            en = np.zeros_like(total)

        i = int(np.lexsort((en, total))[0])
        if not np.isfinite(total[i]):
            continue
        cand = (total[i], en[i], i, stalls[i],
                {"wgt": writes["wgt"][i], "act": writes["act"][i],
                 "out": writes["out"][i]},
                {"out": reads["out"][i]},
                dram_r[i], dram_w[i])
        if best is None or (cand[0], cand[1]) < (best[0], best[1]):
            best = cand

    assert best is not None, "no feasible tiling (SRAM too small?)"
    total, en, i, stalls, w_bits, r_bits, dram_r, dram_w = best
    reads_out = {
        "act": int(sr_act[i]), "wgt": int(sr_wgt[i]),
        "out": int(sr_out_r[i] + r_bits["out"]), "dram": int(dram_r)}
    writes_out = {
        "act": int(w_bits["act"]), "wgt": int(w_bits["wgt"]),
        "out": int(sw_out[i] + w_bits["out"]), "dram": int(dram_w)}
    return LayerStats(int(total), int(stalls), reads_out, writes_out)


def fc_cycles(acc: AcceleratorConfig, ni: int, no: int, iprec: int,
              wprec: int, batch: int, weight_stationary: bool = False,
              energy: Optional[EnergyParams] = None) -> LayerStats:
    """FC = 1x1 conv (simulator.py:383-403)."""
    return conv_cycles(acc, 1, 1, 1, ni, no, iprec, wprec, batch,
                       weight_stationary, energy)
