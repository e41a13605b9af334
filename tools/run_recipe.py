#!/usr/bin/env python
"""Run checked-in experiment recipes (the reference's scripts/*.sh, as data).

The reference encodes every published experiment in bash scripts
(ant_quantization/ImageNet/scripts/*, BERT/scripts/*, olive bert+llm
scripts/*). Here the same experiments live in recipes/*.toml; each
``[[run]]`` maps to one CLI invocation of a tools/ harness, with its exact
hyperparameters (mode, bits, lr, batch, alpha-scan bounds, 8-bit lists).

Usage:
  python tools/run_recipe.py recipes/ant_imagenet_qat.toml --list
  python tools/run_recipe.py recipes/olive_clm.toml --only 'gpt2xl_*' --dry-run
  python tools/run_recipe.py recipes/ant_imagenet_qat.toml \
      --only resnet18_IP-F -- --train_dir /data/train --val_dir /data/val

Everything after ``--`` is appended verbatim to each launched command
(data paths, --limit, --output, ...). When different runs in one recipe
need different values for the same flag (e.g. olive_squad.toml mixes SQuAD
v1.1 and v2.0 runs, which read different dev-set jsons), use the repeatable
``--set 'GLOB:key=value'`` option instead, which applies only to runs whose
name matches the glob:

  python tools/run_recipe.py recipes/olive_squad.toml \
      --set '*_squad:data=/data/dev-v1.1.json' \
      --set '*_squad2:data=/data/dev-v2.0.json'
"""

import argparse
import fnmatch
import os
import subprocess
import sys
import tomllib

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))

RESERVED = {"name", "tool", "notes"}


def load_recipe(path: str) -> dict:
    with open(path, "rb") as f:
        doc = tomllib.load(f)
    if "run" not in doc:
        raise SystemExit(f"{path}: no [[run]] entries")
    return doc


def parse_sets(pairs: list) -> list:
    """Parse --set 'GLOB:key=value' strings into (glob, key, value)."""
    out = []
    for s in pairs:
        head, sep, value = s.partition("=")
        if not sep or ":" not in head:
            raise SystemExit(f"--set {s!r}: expected GLOB:key=value")
        glob, _, key = head.rpartition(":")
        out.append((glob, key, value))
    return out


def build_command(run: dict, defaults: dict, extra: list, sets=()) -> list:
    merged = {**defaults, **run}
    for glob, key, value in sets:
        if fnmatch.fnmatch(run.get("name", ""), glob):
            merged[key] = value
    tool = merged.get("tool")
    if not tool:
        raise SystemExit(f"run {run.get('name')}: no tool")
    cmd = [sys.executable, os.path.join(TOOLS_DIR, tool + ".py")]
    for key, val in merged.items():
        if key in RESERVED:
            continue
        flag = "--" + key
        if isinstance(val, bool):
            if val:
                cmd.append(flag)
        else:
            cmd += [flag, str(val)]
    return cmd + list(extra)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = []
    if "--" in argv:
        cut = argv.index("--")
        argv, extra = argv[:cut], argv[cut + 1:]
    p = argparse.ArgumentParser()
    p.add_argument("recipe")
    p.add_argument("--only", default="*",
                   help="glob over run names (default: all)")
    p.add_argument("--list", action="store_true")
    p.add_argument("--dry-run", action="store_true",
                   help="print commands without executing")
    p.add_argument("--keep-going", action="store_true",
                   help="continue past failing runs")
    p.add_argument("--set", action="append", default=[], dest="sets",
                   metavar="GLOB:key=value",
                   help="override/add a flag only for runs whose name "
                        "matches GLOB (repeatable)")
    args = p.parse_args(argv)
    sets = parse_sets(args.sets)

    doc = load_recipe(args.recipe)
    defaults = doc.get("defaults", {})
    runs = [r for r in doc["run"]
            if fnmatch.fnmatch(r.get("name", ""), args.only)]
    if args.list:
        for r in doc["run"]:
            print(r.get("name", "?"))
        return 0
    if not runs:
        raise SystemExit(f"no runs match --only {args.only!r}")

    failed = []
    for r in runs:
        cmd = build_command(r, defaults, extra, sets)
        print(f"[{r['name']}] " + " ".join(cmd), flush=True)
        if args.dry_run:
            continue
        rc = subprocess.call(cmd)
        if rc != 0:
            failed.append(r["name"])
            if not args.keep_going:
                raise SystemExit(rc)
    if failed:
        print("FAILED: " + ", ".join(failed), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
