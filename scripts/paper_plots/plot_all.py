"""CSV → plot pipeline (reference: scripts/paper_plots/plot_all.py, which
pulls labels/data from the abc-eval-benchmarks S3 bucket and pushes pdf/png
plots back; here the filesystem replaces S3 — point --results at a directory
tree of benchmark artifacts and plots land in --out).

Inputs it understands:
  *_values.csv   the reference CSV schema
                 (t_keygen,t_input_encryption,t_computation,t_decryption),
                 one file per workload — plotted as a grouped phase-time bar
                 chart across workloads.
  suite.jsonl    one JSON object per staged-suite config (bench.py --suite)
                 — plotted as a vs_baseline speedup bar chart.

Usage: python scripts/paper_plots/plot_all.py --results results/ --out plots/
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from pathlib import Path

OUTPUT_FILETYPES = ["pdf", "png"]
PHASES = ["t_keygen", "t_input_encryption", "t_computation", "t_decryption"]


def save_plot(fig, out_dir: Path, name: str) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    for ext in OUTPUT_FILETYPES:
        bbox = "tight" if ext == "pdf" else None
        fig.savefig(out_dir / f"{name}.{ext}", format=ext, dpi=300,
                    bbox_inches=bbox)


def collect_csvs(results_dir: Path):
    rows = {}
    for path in sorted(results_dir.rglob("*_values.csv")):
        workload = path.name[: -len("_values.csv")]
        with open(path) as fh:
            reader = csv.DictReader(fh)
            for row in reader:
                rows[workload] = {k: float(v) for k, v in row.items()
                                  if k in PHASES}
                break
    return rows


def plot_workload_phases(rows, out_dir: Path) -> None:
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    import numpy as np

    if not rows:
        return
    workloads = list(rows)
    x = np.arange(len(workloads))
    width = 0.8 / len(PHASES)
    fig, ax = plt.subplots(figsize=(1.5 + 1.2 * len(workloads), 3.2))
    for i, phase in enumerate(PHASES):
        vals = [rows[w].get(phase, 0.0) for w in workloads]
        ax.bar(x + (i - (len(PHASES) - 1) / 2) * width, vals, width,
               label=phase.replace("t_", ""))
    ax.set_xticks(x)
    ax.set_xticklabels(workloads, rotation=0)
    ax.set_ylabel("time (ms)")
    ax.set_yscale("log")
    ax.legend(fontsize=8)
    ax.set_title("per-phase benchmark times (reference CSV schema)")
    save_plot(fig, out_dir, "plot_workload_phases")
    plt.close(fig)


def collect_suite(results_dir: Path):
    entries = []
    for path in sorted(results_dir.rglob("suite.jsonl")):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    entries.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return [e for e in entries if isinstance(e, dict) and "metric" in e]


def plot_suite_speedups(entries, out_dir: Path) -> None:
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    entries = [e for e in entries
               if isinstance(e.get("vs_baseline"), (int, float))
               and e["vs_baseline"] > 0]
    if not entries:
        return
    names = [e["metric"].split(" ")[0] for e in entries]
    speedups = [e["vs_baseline"] for e in entries]
    fig, ax = plt.subplots(figsize=(1.5 + 1.0 * len(names), 3.2))
    ax.bar(names, speedups)
    ax.axhline(1.0, color="gray", linestyle="--", linewidth=0.8)
    ax.set_ylabel("speedup vs baseline (x)")
    ax.set_yscale("log")
    ax.set_title("staged suite vs documented baselines (BASELINE.md)")
    for tick in ax.get_xticklabels():
        tick.set_rotation(20)
        tick.set_fontsize(7)
    save_plot(fig, out_dir, "plot_suite_speedups")
    plt.close(fig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results", type=Path)
    ap.add_argument("--out", default="plots", type=Path)
    args = ap.parse_args()

    rows = collect_csvs(args.results)
    plot_workload_phases(rows, args.out)
    entries = collect_suite(args.results)
    plot_suite_speedups(entries, args.out)
    made = sorted(os.listdir(args.out)) if args.out.exists() else []
    print(f"plots written to {args.out}: {made}")


if __name__ == "__main__":
    main()
