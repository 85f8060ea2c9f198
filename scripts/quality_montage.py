"""Side-by-side render-vs-GT montage for a quality run.

Pairs the latest COMPLETE set of `step*-NN.png` eval renders in
<run_dir>/images with the matching `gt-NN.png` analytic ground truths
(written by the snippet in scripts/quality_bench.py's workflow — GT view i
pairs with render view i by index) and writes <run_dir>/montage.png
(renders top row, GT bottom row), downscaled 2x to keep the artifact small.
Views whose GT is missing are dropped from BOTH rows so columns always pair
render i with gt i; with no GT at all the montage is render-only and
labeled as such.

Usage: python scripts/quality_montage.py runs/quality_cluster
"""
import glob
import os
import re
import sys

import numpy as np
from PIL import Image


def _half(path):
    im = Image.open(path)
    return np.asarray(im.resize((im.width // 2, im.height // 2)))


def main(run_dir: str):
    imdir = os.path.join(run_dir, "images")
    by_step = {}
    for f in os.listdir(imdir):
        if m := re.match(r"step(\d+)-(\d+)\.png", f):
            by_step.setdefault(int(m.group(1)), []).append(f)
    if not by_step:
        raise SystemExit(f"no eval renders in {imdir}")
    n_views = max(len(v) for v in by_step.values())
    complete = [s for s, v in sorted(by_step.items()) if len(v) == n_views]
    last = complete[-1] if complete else max(by_step)
    renders = sorted(glob.glob(os.path.join(imdir, f"step{last:08d}-*.png")))

    pairs = [(r, os.path.join(imdir, f"gt-{i:02d}.png"))
             for i, r in enumerate(renders)]
    with_gt = [(r, g) for r, g in pairs if os.path.exists(g)]
    if with_gt:
        rows = [np.concatenate([_half(r) for r, _ in with_gt], axis=1),
                np.concatenate([_half(g) for _, g in with_gt], axis=1)]
        label = f"{len(with_gt)} views (renders over GT)"
        if len(with_gt) < len(pairs):
            label += f"; {len(pairs) - len(with_gt)} views without GT dropped"
    else:
        rows = [np.concatenate([_half(r) for r, _ in pairs], axis=1)]
        label = f"{len(pairs)} views (RENDERS ONLY — no gt-NN.png found)"
    n = min(r.shape[1] for r in rows)
    out = np.concatenate([r[:, :n] for r in rows], axis=0)
    path = os.path.join(run_dir, "montage.png")
    Image.fromarray(out).save(path)
    print(f"{path}: step {last}, {label}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/quality_cluster")
