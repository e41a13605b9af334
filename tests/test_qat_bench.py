"""tools/qat_bench.py: QAT-vs-dense step timing harness runs end-to-end
on tiny shapes and reports a sane structure."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "qat_bench", os.path.join(ROOT, "tools", "qat_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_qat_bench_resnet_tiny(capsys):
    mod = _load()
    out = mod.main(["--model", "resnet18", "--batch", "2", "--size", "32",
                    "--inner", "1", "--reps", "1", "--json"])
    assert out["qat_ms_per_step"] > 0 and out["dense_ms_per_step"] > 0
    assert out["overhead"] > 0
    captured = capsys.readouterr()
    assert '"overhead"' in captured.out
