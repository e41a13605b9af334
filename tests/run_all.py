"""One-command test gate: run the full suite as isolated process groups.

    python tests/run_all.py            # full suite (all tests, ~25 min)
    python tests/run_all.py --quick    # <5-min iteration gate

Why not one ``pytest tests/``: long single-process runs segfault inside
XLA:CPU's backend_compile_and_load — the r3 full-suite run died at ~test
270 after ~25 min, and an r4 torch-free repro died the same way after
~22 min, while every file passes in isolation. Two mitigations compose:
(1) the torch-dependent files (torch's runtime in-process is a second,
independent aggravator; transitively loaded even by ``import
transformers``) are marked ``torchdep`` (tests/conftest.py) and run in
their own pytest process, with a conftest guard flagging any new
transitive torch import into the JAX tier; (2) the JAX tier is split
into --jax-chunks processes to bound accumulated compile state per
process.

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


def _torchdep_files() -> set:
    # Deselection is not enough: collection still IMPORTS every module,
    # and the torchdep files import torch at module level
    # (pytest.importorskip at top of file) — the JAX tiers list their
    # files explicitly so torch never enters the process.
    # conftest.TORCHDEP_FILES is the source of truth.
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import TORCHDEP_FILES
    return set(TORCHDEP_FILES)


def _jax_chunks(n: int) -> list:
    """The torch-free test files, split into n balanced chunks — each
    chunk runs in its own pytest process, bounding accumulated XLA:CPU
    compilation state (a >20-min single process has segfaulted inside
    backend_compile_and_load even torch-free)."""
    import glob
    excl = _torchdep_files()
    files = sorted(os.path.basename(f)
                   for f in glob.glob(os.path.join(REPO, "tests",
                                                   "test_*.py"))
                   if os.path.basename(f) not in excl)
    chunks = [files[i::n] for i in range(n)]
    return [[os.path.join("tests", f) for f in c] for c in chunks if c]


def run_group(name: str, marker: str, extra: list) -> tuple:
    cmd = [sys.executable, "-m", "pytest", *(extra or ["tests/"]),
           "-q", "-m", marker]
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
    ap.add_argument("--jax-chunks", type=int, default=3,
                    help="split the JAX tier into this many processes")
    args = ap.parse_args()

    if args.quick:
        groups = [("quick", "quick and not torchdep", _jax_chunks(1)[0])]
    else:
        groups = [(f"jax-{i}", "not torchdep", c)
                  for i, c in enumerate(_jax_chunks(args.jax_chunks))]
        groups.append(("torch", "torchdep", ["tests/"]))

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
