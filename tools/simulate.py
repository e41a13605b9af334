#!/usr/bin/env python
"""Accelerator cycle/energy simulation CLI (run_ant.py equivalent).

Sweeps the six accelerator configurations over the benchmark nets at the
given batch size, prints the normalized-cycles/energy summary table, and
writes the tidy per-(network, accelerator) CSV.

    python tools/simulate.py --batch 64 --out results/ant_res.csv
    python tools/simulate.py --nets vgg16 resnet50 --no-native
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ant_quantization_tpu.perfmodel.nets import BENCHLIST
from ant_quantization_tpu.perfmodel.results import (format_summary,
                                                    normalized_results,
                                                    write_csv)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--nets", nargs="*", default=None, choices=BENCHLIST,
                   help="subset of networks (default: all 8)")
    p.add_argument("--out", default="results/ant_res.csv")
    p.add_argument("--no-native", action="store_true",
                   help="use the numpy model instead of csrc/libtileopt.so")
    args = p.parse_args(argv)

    rows = normalized_results(batch=args.batch, nets=args.nets,
                              use_native=not args.no_native)
    print(format_summary(rows))
    write_csv(rows, args.out)
    print(f"\nwrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
