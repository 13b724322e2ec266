"""Plot sweep results (the reference's plot.py equivalent: FPS-vs-scale
curves per variant/config from the CSV written by bench.sweep)."""

from __future__ import annotations

import csv
import sys
from collections import defaultdict


def plot_sweep(csv_path: str, out_png: str = "sweep.png"):
    rows = list(csv.DictReader(open(csv_path)))
    if not rows:
        raise SystemExit("empty sweep csv")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # hue follows the CONFIG (full-res vs subsampled, Okabe-Ito CVD-safe
    # blue/orange); line style separates ours (solid) from the reference
    # CUDA build (dashed) so identity never rides on color alone
    hue = {0: "#0072B2", 1: "#E69F00"}
    series = defaultdict(list)
    cuda = defaultdict(list)
    for r in rows:
        key = (r["config"], int(r["subsampling"]))
        series[key].append((float(r["scale"]), float(r["avg_fps"])))
        if r.get("cuda_fps"):
            cuda[int(r["subsampling"])].append(
                (float(r["scale"]), float(r["cuda_fps"])))
    fig, ax = plt.subplots(figsize=(8, 5))
    for (config, sub), pts in sorted(series.items()):
        pts.sort()
        label = f"TPU {config}{' +sub' if sub else ''}"
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                marker="o", markersize=4, lw=2, color=hue[sub], label=label)
    for sub, pts in sorted(cuda.items()):
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "--", lw=2,
                color=hue[sub], alpha=0.75,
                label=f"reference CUDA{' +sub' if sub else ''}")
    ax.set_xlabel("scale factor (image shrink)")
    ax.set_ylabel("AVG_FPS (log)")
    ax.set_yscale("log")
    ax.set_title("stereovision_tpu throughput sweep (kitti_mini)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    plot_sweep(sys.argv[1] if len(sys.argv) > 1 else "sweep_results.csv",
               sys.argv[2] if len(sys.argv) > 2 else "sweep.png")
