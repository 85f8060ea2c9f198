"""Categorize a TPU device trace of the train step against the compiled HLO.

Parses the .trace.json.gz (per-op self times on the device tracks), maps each
HLO op/fusion name to source locations found in the optimized-HLO text dump,
and prints a category breakdown (matmul / gather / sort / scatter / other)
with per-source-line attribution of the big fusions.

Usage: python scripts/analyze_trace.py <trace.json.gz> <hlo.txt>
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def load_trace(path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def hlo_op_sources(hlo_path):
    """Map top-level instruction name -> set of source file:line it touches.
    For fusions, collect sources from the fused computation body."""
    src_by_comp = defaultdict(set)   # computation name -> sources
    fusion_calls = {}                # fusion inst name -> called computation
    comp = None
    comp_re = re.compile(r"^%?([\w.\-]+) \(")
    meta_re = re.compile(
        r'source_file="[^"]*/pointnerf_tpu/([^"]+)" source_line=(\d+)')
    fus_re = re.compile(r"%([\w.\-]+) = .*fusion\(.*calls=%?([\w.\-]+)")
    with open(hlo_path) as f:
        for line in f:
            m = comp_re.match(line)
            if m and "=" not in line.split("(")[0]:
                comp = m.group(1)
            for mm in meta_re.finditer(line):
                if comp:
                    src_by_comp[comp].add(f"{mm.group(1)}:{mm.group(2)}")
            m = fus_re.search(line)
            if m:
                fusion_calls[m.group(1)] = m.group(2)
    return src_by_comp, fusion_calls


CATS = [
    ("matmul/conv", re.compile(r"convolution|dot|conv")),
    ("sort", re.compile(r"^sort")),
    ("gather", re.compile(r"gather")),
    ("scatter", re.compile(r"scatter")),
    ("cumsum/reduce-window", re.compile(r"reduce-window|reduce_window")),
    ("copy/transpose", re.compile(r"^copy|transpose|bitcast")),
    ("allreduce/collective", re.compile(r"all-reduce|all-to-all|collective")),
    ("fusion-other", re.compile(r"fusion")),
]


def main():
    trace_path, hlo_path = sys.argv[1], sys.argv[2]
    events = load_trace(trace_path)

    # device-track complete events with durations
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    ops = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            ops[name] += e.get("dur", 0.0)

    src_by_comp, fusion_calls = hlo_op_sources(hlo_path)

    # The trace repeats the step several times; report per-occurrence totals.
    total = sum(ops.values())
    print(f"device op time total (all steps): {total/1e3:.1f} ms")

    cat_tot = defaultdict(float)
    rows = sorted(ops.items(), key=lambda kv: -kv[1])
    for name, dur in rows:
        base = name.split("/")[-1]
        for cat, rex in CATS:
            if rex.search(base):
                cat_tot[cat] += dur
                break
        else:
            cat_tot["other"] += dur
    print("\n== category totals ==")
    for cat, dur in sorted(cat_tot.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {dur/1e3:8.1f} ms  {100*dur/total:5.1f}%")

    print("\n== top 40 ops ==")
    for name, dur in rows[:40]:
        base = name.split("/")[-1]
        comp = fusion_calls.get(base) or fusion_calls.get(base.lstrip("%"))
        srcs = sorted(src_by_comp.get(comp, set()) |
                      src_by_comp.get(base, set()))
        s = (" | " + ", ".join(srcs[:4]) + ("…" if len(srcs) > 4 else "")
             ) if srcs else ""
        print(f"  {dur/1e3:8.2f} ms  {base[:60]:60s}{s}")


if __name__ == "__main__":
    main()
