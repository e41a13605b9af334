"""tools/plot_results.py: the graph_plot equivalent renders headlessly.

The reference's figure helpers (ant_simulator/bitfusion/graph_plot/
barchart.py, stackedbarchart.py) turn run_ant.py output into the paper's
grouped/stacked bar charts; here the same capability runs off the tidy
CSV of tools/simulate.py.
"""

import csv
import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "plot_results", os.path.join(ROOT, "tools", "plot_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rows():
    from ant_quantization_tpu.perfmodel.results import ACCELS
    rows = []
    for net in ("vgg16", "resnet18"):
        for i, accel in enumerate(ACCELS):
            cyc = 0.2 + 0.1 * i
            rows.append({
                "network": net, "accel": accel, "cycles": 1000.0 * (i + 1),
                "norm_cycles": cyc, "static": 0.05, "dram": 0.2,
                "sram": 0.1, "core": 0.15, "norm_energy": 0.5,
            })
    return rows


def test_plots_written(tmp_path):
    mod = _load_tool()
    rows = _rows()
    c = mod.plot_cycles(rows, str(tmp_path / "cycles"))
    e = mod.plot_energy(rows, str(tmp_path / "energy"))
    for p in c + e:
        assert os.path.exists(p) and os.path.getsize(p) > 1000, p
    assert {os.path.splitext(p)[1] for p in c} == {".png", ".pdf"}


def test_cli_roundtrip(tmp_path):
    mod = _load_tool()
    rows = _rows()
    csv_path = tmp_path / "res.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    mod.main([str(csv_path), "--out", str(tmp_path / "figs")])
    for name in ("cycles.png", "cycles.pdf", "energy.png", "energy.pdf"):
        assert os.path.exists(tmp_path / "figs" / name)


def test_read_rows_types(tmp_path):
    mod = _load_tool()
    rows = _rows()
    csv_path = tmp_path / "res.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    back = mod.read_rows(str(csv_path))
    assert back[0]["norm_cycles"] == rows[0]["norm_cycles"]
    assert isinstance(back[0]["static"], float)
