"""Render the QUALITY_<scene>.json eval histories into the PERF.md table.

Reads every QUALITY_*.json in the repo root (written by
scripts/quality_bench.py) and prints a markdown section with the
wall-clock-to-PSNR curve per scene plus time-to-threshold milestones
(BASELINE.json north star: time-to-PSNR on the reference lego schedule).
Falls back to parsing `[eval] step N: psnr=... t=...s` lines from a run log
passed as --log (the run's stdout) when the run was interrupted before the
JSON was written.

Usage: python scripts/quality_report.py [--log /tmp/quality_cluster.log NAME]
"""
import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def curve_from_json(path):
    with open(path) as f:
        d = json.load(f)
    # QUALITY_<scene>[_tag].json — keep the tag so lever A/Bs print apart
    name = os.path.splitext(os.path.basename(path))[0]
    name = name[len("QUALITY_"):] if name.startswith("QUALITY_") else name
    return name, [(e["step"], e["wall_s"], e["psnr"], e.get("ssim"))
                  for e in d["eval"]]


def curve_from_log(path, name):
    rows = []
    pat = re.compile(r"\[eval\] step (\d+): psnr=([\d.]+) ssim=([\d.]+) "
                     r"t=(\d+)s")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(4)),
                             float(m.group(2)), float(m.group(3))))
    return name, rows


def milestones(rows, thresholds=(15, 16, 17, 18, 20, 25, 30)):
    out = []
    for th in thresholds:
        hit = next((r for r in rows if r[2] >= th), None)
        if hit is not None:
            out.append((th, hit[1], hit[0]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", nargs=2, action="append", default=[],
                    metavar=("PATH", "NAME"),
                    help="parse an interrupted run's stdout log instead")
    args = ap.parse_args()

    curves = []
    for path in sorted(glob.glob(os.path.join(ROOT, "QUALITY_*.json"))):
        curves.append(curve_from_json(path))
    for path, name in args.log:
        curves.append(curve_from_log(path, name))
    if not curves:
        print("no QUALITY_*.json found", file=sys.stderr)
        return 1

    for scene, rows in curves:
        if not rows:
            continue
        best = max(r[2] for r in rows)
        print(f"\n### Scene `{scene}` — best held-out PSNR "
              f"{best:.2f} (SSIM {rows[-1][3]:.3f} final)\n")
        print("| wall-clock | step | PSNR | SSIM |")
        print("|---:|---:|---:|---:|")
        keep = rows if len(rows) <= 14 else \
            rows[:: max(1, len(rows) // 12)] + [rows[-1]]
        seen = set()
        for step, t, psnr, ssim in keep:
            if step in seen:
                continue
            seen.add(step)
            print(f"| {t/60:.1f} min | {step} | {psnr:.2f} | "
                  f"{'' if ssim is None else f'{ssim:.4f}'} |")
        ms = milestones(rows)
        if ms:
            print("\ntime-to-PSNR: "
                  + ", ".join(f"**{th}** @ {t/60:.1f} min (step {s})"
                              for th, t, s in ms))
    return 0


if __name__ == "__main__":
    sys.exit(main())
