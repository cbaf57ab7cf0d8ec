"""Join a perfetto device trace with an optimized-HLO dump: aggregate kernel
time by HLO op_name (source layer/pass), giving the per-layer backward
breakdown VERDICT r2 asked for.

Usage: python tools/join_trace_hlo.py [--trace-dir /tmp/fy_trace]
       [--hlo /tmp/train_step_hlo.txt] [--steps 4] [--top 30] [--by op|layer]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_kernel_durations(trace_dir: str) -> tuple[dict, int]:
    traces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True),
                    key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        dur[e["name"]] += e.get("dur", 0) / 1e3  # us -> ms
    return dur, len(events)


def load_hlo_metadata(hlo_path: str) -> dict:
    """kernel name -> (op_name, source_file:line) from the HLO text."""
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = .*?metadata={([^}]*)}")
    op_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
    for line in open(hlo_path):
        m = pat.search(line)
        if not m:
            continue
        name, md = m.group(1), m.group(2)
        op = op_pat.search(md)
        src = src_pat.search(md)
        meta[name] = (
            op.group(1) if op else "",
            f"{os.path.basename(src.group(1))}:{src.group(2)}" if src else "",
        )
    return meta


def classify(op_name: str) -> str:
    """Collapse an op_name path to a coarse bucket."""
    if not op_name:
        return "(unnamed)"
    if "transpose(jvp(DetectionModel))" in op_name:
        m = re.search(r"layers_(\d+)", op_name)
        return f"bwd/layer_{m.group(1)}" if m else "bwd/other"
    if "jvp(DetectionModel)" in op_name:
        m = re.search(r"layers_(\d+)", op_name)
        return f"fwd/layer_{m.group(1)}" if m else "fwd/other"
    for tag in ("tal.py", "loss.py"):
        if tag in op_name:
            return f"loss({tag})"
    m = re.search(r"jit\(train_step\)/([\w()\-]+)", op_name)
    return m.group(1)[:40] if m else op_name[:40]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/fy_trace")
    ap.add_argument("--hlo", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "layer"], default="layer")
    args = ap.parse_args()

    dur, _ = load_kernel_durations(args.trace_dir)
    meta = load_hlo_metadata(args.hlo)

    agg = defaultdict(float)
    unmatched = 0.0
    total = 0.0
    for kname, d in dur.items():
        if kname.startswith("jit_") or kname.isdigit():
            continue  # whole-program envelope events
        total += d
        if kname not in meta:
            unmatched += d
            continue
        op, src = meta[kname]
        key = classify(op) if args.by == "layer" else f"{op[:80]} [{src}]"
        agg[key] += d
    n = args.steps
    print(f"# total kernel time {total/n:.1f} ms/step; unmatched {unmatched/n:.2f} ms")
    for key, d in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d/n:9.3f} ms/step  {key}")


if __name__ == "__main__":
    main()
