"""tools/print_result.py: result-json aggregation into the README-style
mode-column tables (the reference's print_result.sh equivalent)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_table_layout(tmp_path):
    rows = [
        {"task": "cola", "mode": "int", "mcc": 0.0},
        {"task": "cola", "mode": "ant-int-pot", "mcc": 52.61},
        {"task": "cola", "mode": "ant-int-pot-flint", "mcc": 53.91},
        {"task": "cola", "mode": "ant-int-pot-flint", "mcc": 56.33,
         "n8": 10},
        {"task": "sst2", "mode": "int", "accuracy": 79.93},
        {"model": "gpt2-xl", "mode": "ant-int-flint", "perplexity": 19.11},
    ]
    for i, r in enumerate(rows):
        (tmp_path / f"r{i}.json").write_text(json.dumps(r))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "print_result.py"),
         str(tmp_path)], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    header = lines[0]
    # promotion runs land in a trailing ANT4-8 column
    assert header.strip().split("|")[-1].strip() == "ANT4-8"
    cola = next(l for l in lines if l.startswith("cola"))
    assert "56.33" in cola and "53.91" in cola and "0.00" in cola
    gpt = next(l for l in lines if l.startswith("gpt2-xl"))
    assert "19.11" in gpt
