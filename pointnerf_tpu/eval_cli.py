"""Image-folder metric evaluation CLI — run/evaluate.py equivalent.

Compares rendered images against ground-truth images by filename pairing and
writes per-metric txt files + `scores.txt` (reference report_metrics,
run/evaluate.py:34-97). Usage:

    python -m pointnerf_tpu.eval_cli --pred runs/x/images --gt data/gt \
        [--metrics psnr ssim rmse lpips]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .utils.metrics import lpips_fn, lpips_proxy, psnr, rmse, ssim


def load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    im = imageio.imread(path).astype(np.float32) / 255.0
    return im[..., :3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--metrics", nargs="+",
                    default=["psnr", "ssim", "rmse", "lpips", "lpips_proxy"])
    ap.add_argument("--out", default=None,
                    help="output dir for scores (default: --pred)")
    args = ap.parse_args()

    preds = sorted(f for f in os.listdir(args.pred)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    gts = sorted(f for f in os.listdir(args.gt)
                 if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if len(preds) != len(gts):
        raise SystemExit(f"count mismatch: {len(preds)} pred vs {len(gts)} gt")

    out_dir = args.out or args.pred
    per_metric = {m: [] for m in args.metrics}
    lp = lpips_fn("alex") if "lpips" in args.metrics else None
    for pf, gf in zip(preds, gts):
        p = load_image(os.path.join(args.pred, pf))
        g = load_image(os.path.join(args.gt, gf))
        if "psnr" in per_metric:
            per_metric["psnr"].append(psnr(p, g))
        if "ssim" in per_metric:
            per_metric["ssim"].append(ssim(p, g))
        if "rmse" in per_metric:
            per_metric["rmse"].append(rmse(p, g))
        if lp is not None and "lpips" in per_metric:
            per_metric["lpips"].append(lp(p, g))
        if "lpips_proxy" in per_metric:
            per_metric["lpips_proxy"].append(lpips_proxy(p, g))

    lines = []
    for m, vals in per_metric.items():
        if not vals:
            lines.append(f"{m}: unavailable")
            continue
        with open(os.path.join(out_dir, f"{m}.txt"), "w") as f:
            f.write("\n".join(f"{v:.6f}" for v in vals))
        lines.append(f"{m}: {float(np.mean(vals)):.6f}")
    with open(os.path.join(out_dir, "scores.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
