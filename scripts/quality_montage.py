"""Side-by-side render-vs-GT montage for a quality run.

Pairs the latest `step*-NN.png` eval renders in <run_dir>/images with the
`gt-NN.png` analytic ground truths and writes <run_dir>/montage.png
(renders top row, GT bottom row), downscaled 2x to keep the artifact small.

Usage: python scripts/quality_montage.py runs/quality_cluster
"""
import glob
import os
import re
import sys

import numpy as np
from PIL import Image


def main(run_dir: str):
    imdir = os.path.join(run_dir, "images")
    steps = sorted({int(m.group(1)) for f in os.listdir(imdir)
                    if (m := re.match(r"step(\d+)-\d+\.png", f))})
    if not steps:
        raise SystemExit(f"no eval renders in {imdir}")
    last = steps[-1]
    renders = sorted(glob.glob(os.path.join(imdir, f"step{last:08d}-*.png")))
    rows = []
    for kind, paths in (("render", renders),
                        ("gt", [os.path.join(imdir, f"gt-{i:02d}.png")
                                for i in range(len(renders))])):
        imgs = []
        for p in paths:
            if not os.path.exists(p):
                continue
            im = Image.open(p)
            imgs.append(np.asarray(
                im.resize((im.width // 2, im.height // 2))))
        if imgs:
            rows.append(np.concatenate(imgs, axis=1))
    n = min(r.shape[1] for r in rows)
    out = np.concatenate([r[:, :n] for r in rows], axis=0)
    path = os.path.join(run_dir, "montage.png")
    Image.fromarray(out).save(path)
    print(f"{path}: step {last}, {len(renders)} views (renders over GT)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/quality_cluster")
