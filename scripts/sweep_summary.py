#!/usr/bin/env python
"""Summarize a sweep CSV: vs_cuda per row, winners/losers, missing
configs vs the reference's 52-config grid (BASELINE.md)."""
import csv
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from stereovision_tpu.bench.sweep import CUDA_FPS  # noqa: E402


def main(path="bench/sweep_r5.csv"):
    rows = {}
    with open(path) as f:
        for r in csv.DictReader(f):
            key = (round(float(r["scale"]), 2), int(r["subsampling"]))
            rows[key] = r          # last measurement of a config wins
    wins = losses = 0
    print(f"{'scale':>5} {'sub':>3} {'fps':>8} {'cuda':>8} {'ratio':>6}  "
          f"{'window':>15}")
    for key in sorted(CUDA_FPS):
        r = rows.get(key)
        if r is None:
            print(f"{key[0]:>5} {key[1]:>3} {'MISSING':>8}")
            continue
        ratio = float(r["vs_cuda"]) if r["vs_cuda"] else float("nan")
        tag = ""
        if ratio >= 1.0:
            wins += 1
        else:
            losses += 1
            tag = "  <-- LOSS"
        print(f"{key[0]:>5} {key[1]:>3} {float(r['avg_fps']):>8.2f} "
              f"{CUDA_FPS[key]:>8.2f} {ratio:>6.2f}  "
              f"[{r.get('win_lo','')}, {r.get('win_hi','')}]{tag}")
    print(f"\n{wins} wins / {losses} losses / "
          f"{len(CUDA_FPS) - len([k for k in CUDA_FPS if k in rows])} missing "
          f"of {len(CUDA_FPS)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
