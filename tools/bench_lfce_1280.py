"""Driver config #5: yolo11l-fce (BiCoordCrossAtt [512,16,8]) @ 1280px streaming.

BASELINE.json configs[4] — the l-scale FCE variant with explicit
reduction=16 / heads=8 cross-attention (reference fce_block.py:183-284
semantics with the [512,16,8] arg triple) running streaming 1280px video
inference. This script produces the perf evidence VERDICT r4 missing #1
asked for:

  1. e2e roofline rows (normalize+forward+decode+NMS, bf16) at batch 1/4/8
     — measured ms vs XLA cost-analysis MXU/HBM roofs;
  2. a perfetto kernel trace + optimized-HLO join, aggregated by source
     layer, printing the share of device time attributable to the FCE
     modules (nn/fce.py strip-pool / cross-attn / gating) — the input to
     the deferred FCE Pallas-fusion decision (PARITY.md §fce);
  3. the same rows for the plain yolo11l at 1280px, so the FCE overhead is
     also visible as an e2e delta.

Run on the real chip:  python tools/bench_lfce_1280.py [--batches 1 4 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_HBM_BW = 819e9


def build_lfce(reduction: int = 16, heads: int = 8):
    """yolo11l-fce with the BiCoordCrossAtt arg triple patched to [512,r,h]."""
    import yaml

    from fce_yolo_tpu.nn.model import build_model

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fce_yolo_tpu", "cfg", "models", "yolo11-fce.yaml")
    with open(path) as f:
        d = yaml.safe_load(f)
    for row in d["backbone"]:
        if row[2] == "BiCoordCrossAtt":
            row[3] = [512, reduction, heads]
    return build_model(d, scale="l")


def roundtrip():
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    return (time.perf_counter() - t0) / 10


def bench_one(model, batch: int, imgsz: int, rt: float, iters: int = 12,
              label: str = ""):
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import init_variables
    from fce_yolo_tpu.ops.nms import batched_nms

    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
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
    compiled = jax.jit(predict).lower(variables, img).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    _ = float(compiled(variables, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [compiled(variables, img) for _ in range(iters)]
        _ = float(sum(outs))
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / iters)
    t_comp = flops / V5E_BF16_PEAK
    t_mem = byts / V5E_HBM_BW
    sol = max(t_comp, t_mem)
    bound = "HBM" if t_mem > t_comp else "MXU"
    print(f"{label} b{batch} @{imgsz}: {best*1e3:7.2f} ms | "
          f"{flops/1e12:6.2f} TFLOP -> {t_comp*1e3:6.2f} ms MXU-roof | "
          f"{byts/1e9:6.1f} GB -> {t_mem*1e3:6.2f} ms HBM-roof | "
          f"{bound}-bound {sol/best*100:5.1f}% SoL | {batch/best:7.1f} img/s",
          flush=True)
    return compiled, variables, img, best


def profile_fce_share(compiled, variables, img, trace_dir: str, hlo_path: str):
    """Capture a device trace + HLO text; aggregate kernel ms by source layer."""
    import jax

    with open(hlo_path, "w") as f:
        f.write(compiled.as_text())
    with jax.profiler.trace(trace_dir):
        outs = [compiled(variables, img) for _ in range(4)]
        _ = float(sum(outs))

    from tools.join_trace_hlo import load_hlo_metadata, load_kernel_durations

    dur, _n = load_kernel_durations(trace_dir)
    # drop the whole-program envelope event — it double-counts device time
    dur = {k: v for k, v in dur.items() if not k.startswith("jit_")}
    meta = load_hlo_metadata(hlo_path)
    by_layer: dict = {}
    fce_ms = total_ms = 0.0
    for kname, ms in dur.items():
        base = kname.split(".")[0]
        op, src = meta.get(kname, meta.get(base, ("", "")))
        total_ms += ms
        key = "?"
        if "fce.py" in src:
            fce_ms += ms
            key = f"FCE {src.split('/')[-1]}"
        elif op:
            seg = [s for s in op.split("/") if s.startswith("layers_")]
            key = seg[0] if seg else op.split("/")[-1][:40]
        by_layer[key] = by_layer.get(key, 0.0) + ms
    steps = 4
    print(f"\n# kernel trace: {total_ms/steps:.2f} ms/step device time; "
          f"FCE-attributed {fce_ms/steps:.3f} ms/step "
          f"({100*fce_ms/max(total_ms,1e-9):.2f}% of device time)")
    for k, v in sorted(by_layer.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/steps:8.3f} ms/step  {k}")
    return fce_ms / steps, total_ms / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int, default=[1, 4, 8])
    ap.add_argument("--imgsz", type=int, default=1280)
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/fy_lfce_trace")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rt = roundtrip()
    print(f"# roundtrip {rt*1e3:.1f} ms  device={jax.devices()[0]}")

    model, spec, strides = build_lfce(16, 8)
    from fce_yolo_tpu.nn.model import param_count

    keep = None
    for b in args.batches:
        compiled, variables, img, best = bench_one(
            model, b, args.imgsz, rt, label="yolo11l-fce[512,16,8]")
        if b == max(args.batches):
            keep = (compiled, variables, img)

    if not args.skip_plain:
        from fce_yolo_tpu.nn.model import build_model

        plain, _, _ = build_model("fce_yolo_tpu/cfg/models/yolo11.yaml", scale="l")
        for b in [max(args.batches)]:
            bench_one(plain, b, args.imgsz, rt, label="yolo11l (plain)")

    if keep is not None:
        profile_fce_share(*keep, args.trace_dir, "/tmp/fy_lfce_hlo.txt")


if __name__ == "__main__":
    main()
