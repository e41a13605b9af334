"""perfmodel/arch.py: architecture-optimization sweep (the experiments/
capability — architecture_optimization.py + ideal_benefits_variable_
precision.py rebuilt on the analytic area/cycle models)."""

import dataclasses

from ant_quantization_tpu.perfmodel import arch
from ant_quantization_tpu.perfmodel.energy import CONFIGS
from ant_quantization_tpu.perfmodel.model import AcceleratorConfig


def test_area_models_monotone():
    assert arch.pe_area_mm2(8, 4) > arch.pe_area_mm2(8, 8) > 0
    small = AcceleratorConfig(n=8, m=8, sram_act=32 * 1024,
                              sram_wgt=32 * 1024, sram_out=32 * 1024)
    big = AcceleratorConfig(n=32, m=32, sram_act=256 * 1024,
                            sram_wgt=128 * 1024, sram_out=128 * 1024)
    assert arch.total_area_mm2(big) > arch.total_area_mm2(small)
    # the reference's ANT config lands at a plausible accelerator size
    assert 1.0 < arch.total_area_mm2(CONFIGS["ant"]) < 20.0


def test_candidates_respect_budget():
    cands = arch.candidates(3.5, sram_kb=(32, 64))
    assert cands, "budget should admit at least the small arrays"
    assert all(arch.total_area_mm2(c) <= 3.5 for c in cands)
    # a tiny budget admits nothing
    assert arch.candidates(0.01, sram_kb=(32,)) == []


def test_sweep_ranks_and_filters():
    pts = arch.sweep(3.5, ["vgg16"], batch=4,
                     arrays=[(8, 8), (16, 16)], sram_kb=(32, 64))
    assert pts
    cycles = [p.mean_cycles for p in pts]
    assert cycles == sorted(cycles)
    assert all(p.area_mm2 <= 3.5 for p in pts)
    # bigger arrays (when in budget) should be on the fast end
    best = pts[0].cfg
    assert best.n * best.m >= pts[-1].cfg.n * pts[-1].cfg.m


def test_variable_precision_benefit():
    cfg = dataclasses.replace(CONFIGS["ant"], n=8, m=8)
    r = arch.variable_precision_benefit(cfg, ["vgg16"], batch=4)
    # ANT tables are mostly 4-bit: a decomposable 8/4 array must beat the
    # fixed 8-bit one, at some area overhead
    assert r["speedup"] > 1.5
    assert r["area_overhead"] > 1.0
    assert r["variable"].mean_cycles < r["fixed"].mean_cycles


def test_rank_modes_differ_in_key_only():
    pts_c = arch.sweep(3.5, ["vgg16"], batch=4, arrays=[(8, 8)],
                       sram_kb=(32, 64), rank="cycles")
    pts_e = arch.sweep(3.5, ["vgg16"], batch=4, arrays=[(8, 8)],
                       sram_kb=(32, 64), rank="edp")
    assert {id(type(p)) for p in pts_c} == {id(type(p)) for p in pts_e}
    assert len(pts_c) == len(pts_e)
    edps = [p.edp for p in pts_e]
    assert edps == sorted(edps)
