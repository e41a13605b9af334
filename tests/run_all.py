"""One-command test gate: run the full suite as isolated process groups.

    python tests/run_all.py            # full suite (all tests, ~25 min)
    python tests/run_all.py --quick    # <5-min iteration gate

Why not one ``pytest tests/``: torch (loaded by the reference-oracle /
HF-parity tests, and transitively by ``import transformers``) in the same
process as XLA:CPU corrupts compilation — the r3 full-suite run
segfaulted inside backend_compile_and_load at ~test 270 after ~25 min,
while every file passes in isolation. The torch-dependent files are
marked ``torchdep`` (tests/conftest.py) and run in their own pytest
process; the JAX tier runs torch-free and a conftest guard flags any new
transitive torch import.

Exit code 0 iff every group passes and every collected test is accounted
for (the groups partition the suite: -m "not torchdep" + -m torchdep).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torchdep_ignores() -> list:
    # Deselection is not enough: collection still IMPORTS every module,
    # and the torchdep files import torch at module level
    # (pytest.importorskip at top of file) — --ignore keeps them out of
    # the process entirely. conftest.TORCHDEP_FILES is the source of
    # truth.
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import TORCHDEP_FILES
    return [a for f in sorted(TORCHDEP_FILES)
            for a in ("--ignore", os.path.join("tests", f))]


def run_group(name: str, marker: str, extra: list) -> tuple:
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "-m", marker,
           *extra]
    print(f"=== {name}: {' '.join(cmd)} ===", flush=True)
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = p.stdout + p.stderr
    tail = "\n".join(out.strip().splitlines()[-12:])
    print(tail, flush=True)
    m = re.search(r"(\d+) passed", out)
    passed = int(m.group(1)) if m else 0
    leaked = "TORCH-LEAK-GUARD" in out
    ok = p.returncode == 0 and passed > 0 and not leaked
    if leaked:
        print(f"!! {name}: torch leaked into a JAX-tier process", flush=True)
    print(f"=== {name}: rc={p.returncode} passed={passed} "
          f"({time.time() - t0:.0f}s) ===\n", flush=True)
    return ok, passed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fast tier only (quick marker, torch-free)")
    args = ap.parse_args()

    if args.quick:
        groups = [("quick", "quick and not torchdep", _torchdep_ignores())]
    else:
        groups = [
            ("jax", "not torchdep", _torchdep_ignores()),
            ("torch", "torchdep", []),
        ]

    total, all_ok = 0, True
    for name, marker, extra in groups:
        ok, passed = run_group(name, marker, extra)
        all_ok &= ok
        total += passed
    print(f"TOTAL: {total} passed across {len(groups)} group(s); "
          + ("ALL GREEN" if all_ok else "FAILURES"))
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
