"""On-chip A/B sweep of the round-3 perf levers (VERDICT r3 next #1).

Sweeps BENCH_KNN_SELECT x BENCH_SLOT_SELECT x BENCH_GATHER_BWD (and the
hit-counter gate) as separate bench.py subprocesses so each cell compiles
and times in a clean process, and appends one JSON line per cell to
runs/perf_ab_r04.jsonl. The lever semantics are exact-parity A/B modes
(tests/test_ops.py, tests/test_pallas_knn.py, tests/test_gather_bwd.py);
this script only measures them at the reference lego budget
(/root/reference/dev_scripts/w_n360/lego.sh:51-66,110-112 — 3600 rays,
D=400 -> SR=80 -> K=8).

Usage: python scripts/bench_ab.py [--out runs/perf_ab_r04.jsonl]
                                  [--cells knn|slot|gather|hits|all]
"""
import argparse
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KNN = ["sort", "argmin", "topk", "pallas"]
SLOT = ["sort", "scatter"]
GATHER = ["scatter", "sort"]


def run_cell(env_knobs, timeout=900):
    env = dict(os.environ)
    env.update(env_knobs)
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=timeout, cwd=REPO)
    wall = time.time() - t0
    line = None
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = json.loads(ln)
    rec = {"knobs": env_knobs, "wall_s": round(wall, 1),
           "rc": p.returncode}
    if line:
        rec.update({"rays_per_sec": line["value"],
                    "vs_baseline": line["vs_baseline"]})
    else:
        rec["stderr_tail"] = p.stderr[-800:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "perf_ab_r04.jsonl"))
    ap.add_argument("--cells", default="all")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    cells = []
    if args.cells in ("all", "knn"):
        # full 4x2x2 grid: knn_select x slot_select x gather_bwd
        for k, s, g in itertools.product(KNN, SLOT, GATHER):
            cells.append({"BENCH_KNN_SELECT": k, "BENCH_SLOT_SELECT": s,
                          "BENCH_GATHER_BWD": g})
    if args.cells in ("all", "hits"):
        # hit-counter cost at the default lever combo
        cells.append({"BENCH_TRACK_HITS": "1"})

    with open(args.out, "a") as f:
        for i, knobs in enumerate(cells):
            rec = run_cell(knobs)
            rec["cell"] = i
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
