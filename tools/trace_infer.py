"""Kernel-level trace of the e2e inference program for chosen scales.

VERDICT r4 weak #1: yolo11l at 80% / yolo11x at 57% of their rooflines at
640px while n/s/m are >=92%. This tool reproduces bench.py's exact e2e
config per scale, captures a perfetto device trace + the optimized HLO, and
prints (a) per-source-layer aggregation, (b) the top raw kernels with their
HLO instruction snippets (conv shapes, fusion kinds) so the conv-emitter
hotspots are identifiable, (c) the unattributed share explicitly.

Run on the real chip:  python tools/trace_infer.py --scales l x
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_predict(scale: str, batch: int, imgsz: int):
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.ops.nms import batched_nms

    import os as _os

    from fce_yolo_tpu.nn.model import fold_conv_bn
    from fce_yolo_tpu.nn.modules import fused_bn_scope

    model, spec, strides = build_model(
        "fce_yolo_tpu/cfg/models/yolo11.yaml", scale=scale)
    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
    fold = not _os.environ.get("FY_NO_FOLD_BN")
    if fold:
        variables = fold_conv_bn(variables)  # production predictor default
    bf16 = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: x.astype(bf16), variables["params"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    def predict(variables, images_u8):
        x = images_u8.astype(bf16) / 255.0
        preds = model.apply(variables, x, train=False)["preds"]
        out = batched_nms(preds, conf_thres=0.25, iou_thres=0.45,
                          max_det=300, multi_label=False)
        return out["boxes"].sum() + out["scores"].sum() + out["valid"].sum()

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), np.uint8))
    import contextlib

    with fused_bn_scope() if fold else contextlib.nullcontext():
        compiled = jax.jit(predict).lower(variables, img).compile()
    return compiled, variables, img


def hlo_lines(hlo_path: str) -> dict:
    """instruction name -> full HLO line (for shape/kind snippets)."""
    out = {}
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = ")
    for line in open(hlo_path):
        m = pat.match(line)
        if m:
            out[m.group(1)] = line.strip()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", default=["l", "x"])
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--top", type=int, default=22)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.join_trace_hlo import load_hlo_metadata, load_kernel_durations

    for scale in args.scales:
        batch = {"x": 16}.get(scale, 32)
        compiled, variables, img = build_predict(scale, batch, args.imgsz)
        hlo_path = f"/tmp/fy_infer_{scale}_hlo.txt"
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
        trace_dir = f"/tmp/fy_infer_{scale}_trace"
        _ = float(compiled(variables, img))  # warmup
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            outs = [compiled(variables, img) for _ in range(args.steps)]
            _ = float(sum(outs))
        wall = (time.perf_counter() - t0) / args.steps

        dur, _n = load_kernel_durations(trace_dir)
        # drop the whole-program envelope event ("jit_predict(...)") — it
        # spans every kernel and would double-count device time
        dur = {k: v for k, v in dur.items() if not k.startswith("jit_")}
        meta = load_hlo_metadata(hlo_path)
        lines = hlo_lines(hlo_path)
        total = sum(dur.values())
        unattr = sum(ms for k, ms in dur.items()
                     if k not in meta and k.split(".")[0] not in meta)

        by_layer: dict = {}
        for kname, ms in dur.items():
            op, src = meta.get(kname, meta.get(kname.split(".")[0], ("", "")))
            seg = [s for s in op.split("/") if s.startswith("layers_")]
            key = seg[0] if seg else (op.split("/")[-1][:40] if op else "?")
            by_layer[key] = by_layer.get(key, 0.0) + ms

        print(f"\n===== yolo11{scale} b{batch} @{args.imgsz}: wall {wall*1e3:.2f} ms/step, "
              f"device {total/args.steps:.2f} ms/step, unattributed "
              f"{100*unattr/max(total,1e-9):.1f}%")
        print("-- by source layer:")
        for k, v in sorted(by_layer.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {v/args.steps:8.3f} ms/step  {k}")
        print("-- top raw kernels:")
        for kname, ms in sorted(dur.items(), key=lambda kv: -kv[1])[:args.top]:
            line = lines.get(kname, lines.get(kname.split(".")[0], ""))
            snip = line[:200]
            op, src = meta.get(kname, meta.get(kname.split(".")[0], ("", "?")))
            print(f"  {ms/args.steps:8.3f} ms/step  {kname[:46]:46s} {src.split('/')[-1] if src else '?'}")
            if snip:
                print(f"             {snip}")


if __name__ == "__main__":
    main()
