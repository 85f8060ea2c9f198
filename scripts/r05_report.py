"""Assemble the round-5 quality tables from QUALITY_*.json artifacts.

Prints (markdown-ready):
 - the cluster full-budget wall-clock-to-PSNR milestone rows (BASELINE.md
   north-star protocol, VERDICT r4 #3);
 - the per-lever ablation table (base / importance / hit-boost / split,
   VERDICT r4 #2);
 - the thicket all-levers vs base-fixed comparison;
 - the 3-arm coverage-hole table (points / hybrid / hybrid+creation,
   VERDICT r4 #7).

Host-light: reads JSON only. Run after scripts/r05_run_queue.sh.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def best(d):
    if not d or not d.get("eval"):
        return float("nan")
    return max(e["psnr"] for e in d["eval"])


def at_step(d, step):
    if not d:
        return None
    cands = [e for e in d["eval"] if e["step"] <= step]
    return cands[-1] if cands else None


def fmt(e, key="psnr"):
    return f"{e[key]:.2f}" if e else "—"


def main():
    print("## Cluster full budget (post-max_d-fix), wall-clock milestones")
    d = load("QUALITY_cluster_full_r5.json")
    if d:
        print("| wall-clock | step | PSNR | SSIM |")
        print("|---:|---:|---:|---:|")
        for e in d["eval"]:
            print(f"| {e['wall_s'] / 60:.1f} min | {e['step']} | "
                  f"{e['psnr']:.2f} | {e['ssim']:.4f} |")
        # time-to-PSNR thresholds
        marks = {}
        for e in d["eval"]:
            for t in (16, 17, 18, 19, 20, 21, 22, 23, 24, 25):
                if e["psnr"] >= t and t not in marks:
                    marks[t] = e["wall_s"] / 60
        print("time-to-PSNR: " + ", ".join(
            f"{t} @ {m:.1f} min" for t, m in sorted(marks.items())))
    else:
        print("(missing)")

    print("\n## Per-lever ablation (cluster, matched steps, 8 held-out "
          "views; base = the no-lever full_r5 curve — identical config)")
    arms = [("importance 0.5", "QUALITY_cluster_ab_imp.json"),
            ("hit-boost 4.0", "QUALITY_cluster_ab_hit.json"),
            ("split 600/512", "QUALITY_cluster_ab_split.json")]
    full = load("QUALITY_cluster_full_r5.json")
    print("| lever | last eval (step) | PSNR | base @ matched step | delta |")
    print("|---|---:|---:|---:|---:|")
    for n, p in arms:
        d = load(p)
        if not d or not d.get("eval"):
            print(f"| {n} | — | — | — | — |")
            continue
        e = d["eval"][-1]
        # base: linear interpolation of the full_r5 curve at e['step']
        fe = full["eval"] if full else []
        lo = [x for x in fe if x["step"] <= e["step"]]
        hi = [x for x in fe if x["step"] >= e["step"]]
        if lo and hi:
            a, b2 = lo[-1], hi[0]
            t = (0.0 if b2["step"] == a["step"] else
                 (e["step"] - a["step"]) / (b2["step"] - a["step"]))
            bp = a["psnr"] + t * (b2["psnr"] - a["psnr"])
            print(f"| {n} | {e['step']} | {e['psnr']:.2f} | {bp:.2f} | "
                  f"{e['psnr'] - bp:+.2f} |")
        else:
            print(f"| {n} | {e['step']} | {e['psnr']:.2f} | — | — |")

    print("\n## Thicket: all levers vs base (r4 base_fixed: 22.39 @ 1500)")
    d = load("QUALITY_thicket_levers_r5.json")
    if d:
        print("| step | PSNR | SSIM | wall min |")
        print("|---:|---:|---:|---:|")
        for e in d["eval"]:
            print(f"| {e['step']} | {e['psnr']:.2f} | {e['ssim']:.4f} | "
                  f"{e['wall_s'] / 60:.1f} |")
    else:
        print("(missing)")

    print("\n## Coverage-hole 3-arm A/B (cluster minus prims 1,4; 4000 "
          "steps @400^2, probes ON)")
    arms3 = [("points-only", "QUALITY_cluster_hole_pts_r5.json"),
             ("+ hybrid (nerf_importance=8)", "QUALITY_cluster_hole_nerf_r5.json"),
             ("+ hybrid + nerf_create_points", "QUALITY_cluster_hole_create_r5.json")]
    steps = [1000, 2000, 3000, 4000]
    print("| arm | " + " | ".join(f"@{s}" for s in steps) + " | best |")
    print("|---|" + "---:|" * (len(steps) + 1))
    for n, p in arms3:
        d = load(p)
        row = " | ".join(fmt(at_step(d, s)) for s in steps)
        print(f"| {n} | {row} | {best(d):.2f} |")


if __name__ == "__main__":
    main()
