#!/usr/bin/env python
"""Strong/weak-scaling analysis of benchmark CSVs.

Equivalent of the reference's ``performance_analysis.ipynb`` (pandas/seaborn
strong-scaling, speedup and weak-scaling plots) as a script: reads
``time,proc,dim_x,dim_y[,solver,prec]`` CSVs (both this repo's harness
output and the reference's ``performance_log.csv`` format), prints
mean/std/speedup tables, and optionally writes matplotlib plots.

Usage:
    python scripts/analyze_performance.py performance_log_tpu.csv \
        [--baseline 3600] [--plot out.png]
"""

from __future__ import annotations

import argparse
import csv
import sys
from collections import defaultdict


def load(path: str):
    rows = []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        has_sp = len(header) >= 6
        for line in reader:
            if not line:
                continue
            rows.append(
                dict(
                    time=float(line[0]),
                    proc=int(line[1]),
                    dim_x=int(line[2]),
                    dim_y=int(line[3]),
                    solver=int(line[4]) if has_sp and len(line) > 4 else -1,
                    prec=int(line[5]) if has_sp and len(line) > 5 else -1,
                )
            )
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv", nargs="+")
    ap.add_argument(
        "--baseline",
        type=float,
        default=None,
        help="sequential reference seconds for speedup "
        "(the reference notebook uses 3600)",
    )
    ap.add_argument("--plot", default=None, help="write a PNG plot")
    args = ap.parse_args(argv)

    groups = defaultdict(list)
    for path in args.csv:
        for r in load(path):
            key = (r["solver"], r["prec"], r["proc"], r["dim_x"], r["dim_y"])
            groups[key].append(r["time"])

    print(f"{'solver':>6} {'prec':>4} {'proc':>5} {'mesh':>9} "
          f"{'n':>3} {'mean_s':>10} {'std_s':>8} {'speedup':>8}")
    table = []
    for key in sorted(groups):
        ts = groups[key]
        mean = sum(ts) / len(ts)
        std = (sum((t - mean) ** 2 for t in ts) / len(ts)) ** 0.5
        sp = args.baseline / mean if args.baseline else float("nan")
        s, p, n, dx, dy = key
        print(f"{s:>6} {p:>4} {n:>5} {dx:>4}x{dy:<4} "
              f"{len(ts):>3} {mean:>10.2f} {std:>8.2f} {sp:>8.2f}")
        table.append((key, mean, std))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        series = defaultdict(list)
        for (s, p, n, dx, dy), mean, std in table:
            series[(s, p, dx, dy)].append((n, mean, std))
        for (s, p, dx, dy), pts in sorted(series.items()):
            pts.sort()
            ns = [q[0] for q in pts]
            ms = [q[1] for q in pts]
            es = [q[2] for q in pts]
            ax.errorbar(ns, ms, yerr=es, marker="o",
                        label=f"solver={s} prec={p} {dx}x{dy}")
        ax.set_xlabel("devices")
        ax.set_ylabel("wall clock [s]")
        ax.set_yscale("log")
        ax.set_xscale("log", base=2)
        ax.grid(True, which="both", alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.plot, dpi=150)
        print(f"wrote {args.plot}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
