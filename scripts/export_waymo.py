"""Export Waymo Open Dataset TFRecords to waymo_ft npz bundles.

One-time conversion (reference data/load_waymo.py:177+ re-reads TFRecords at
every launch; here training consumes only the bundle). Requires tensorflow +
waymo_open_dataset where the raw data lives; see
pointnerf_tpu/data/waymo_export.py.

Usage:
  python scripts/export_waymo.py seq1.tfrecord [seq2.tfrecord ...] \
      --out-dir data/waymo_npz --frames 30 --scale 10 --vox-res 100
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnerf_tpu.data.waymo_export import export_sequences  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tfrecords", nargs="+")
    ap.add_argument("--out-dir", default="waymo_npz")
    ap.add_argument("--frames", type=int, default=30,
                    help="frames per sequence (-1 = all)")
    ap.add_argument("--start-frame", type=int, default=0)
    ap.add_argument("--step", type=int, default=10,
                    help="every step-th frame is test (load_waymo.py:286)")
    ap.add_argument("--scale", type=float, default=10.0,
                    help="pose/intrinsic downscale factor")
    ap.add_argument("--vox-res", type=int, default=100,
                    help="per-frame LiDAR voxel-downsample resolution")
    ap.add_argument("--no-points", action="store_true")
    args = ap.parse_args()
    outs = export_sequences(
        args.tfrecords, args.out_dir, frames_length=args.frames,
        start_frame=args.start_frame, load_points=not args.no_points,
        step=args.step, scale_factor=args.scale, vox_res=args.vox_res)
    for o in outs:
        print(o)


if __name__ == "__main__":
    main()
