"""Roofline analysis of the e2e inference pipeline (bench.py's exact config).

For the jitted normalize+forward+decode+NMS program this prints, per scale/
batch: measured ms, XLA cost-analysis FLOPs and HBM bytes accessed, the
compute roofline (flops / bf16 peak), the memory roofline (bytes / HBM BW),
and which bound the measured time sits against. The train-step analog of
this argument lives in EVIDENCE.md (round 3); this closes the loop for
inference ("speed-of-light" accounting, VERDICT r2 'don't stop at parity').

Run on the real chip:  python tools/roofline_infer.py [--scales n s m] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TPU v5e bf16 FLOP/s (validated by tools/probe_int8.py: 194.8 measured)
V5E_HBM_BW = 819e9  # TPU v5e HBM bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", default=["n", "s", "m", "l", "x"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--cfg", default="fce_yolo_tpu/cfg/models/yolo11.yaml")
    ap.add_argument("--train", action="store_true",
                    help="also roofline the full train step per scale")
    ap.add_argument("--no-fused", action="store_true",
                    help="skip the Pallas fused-stem pipeline row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.ops.nms import batched_nms
    from fce_yolo_tpu.ops.pallas_stem import apply_with_fused_stem, stem_spec_from_model

    try:  # persistent compile cache — big-scale compiles dominate wall time
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".cache", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    rt = (time.perf_counter() - t0) / 10
    print(f"# roundtrip {rt*1e3:.1f} ms  device={jax.devices()[0]}")
    print(f"# peaks: {V5E_BF16_PEAK/1e12:.0f} TF/s bf16, {V5E_HBM_BW/1e9:.0f} GB/s HBM")

    for scale in args.scales:
        batch = {"n": args.batch, "x": 16}.get(scale, max(args.batch // 4, 16))
        model, spec, strides = build_model(args.cfg, scale=scale)
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
        img = jnp.asarray(rng.randint(0, 255, (batch, args.imgsz, args.imgsz, 3), np.uint8))
        compiled = jax.jit(predict).lower(variables, img).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))

        _ = float(compiled(variables, img))  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [compiled(variables, img) for _ in range(args.iters)]
            _ = float(sum(outs))
            best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / args.iters)

        t_comp = flops / V5E_BF16_PEAK  # s, compute roofline
        t_mem = byts / V5E_HBM_BW  # s, memory roofline
        bound = "HBM" if t_mem > t_comp else "MXU"
        sol = max(t_comp, t_mem)
        print(
            f"yolo11{scale} b{batch}: {best*1e3:7.2f} ms measured | "
            f"{flops/1e12:6.2f} TFLOP -> {t_comp*1e3:6.2f} ms MXU-roof | "
            f"{byts/1e9:6.1f} GB -> {t_mem*1e3:6.2f} ms HBM-roof | "
            f"{bound}-bound, {sol/best*100:5.1f}% of speed-of-light | "
            f"{batch/best:7.0f} img/s"
        )

        # fused-stem pipeline (ops/pallas_stem.py), judged against the SAME
        # baseline-graph roofline so the % is comparable with round 3's
        # numbers (the fused graph's own cost analysis no longer counts the
        # stem's intermediate tensors it eliminated)
        ss = None if args.no_fused else stem_spec_from_model(
            spec, (args.imgsz, args.imgsz))
        if ss is not None:
            def predict_fused(variables, images_u8):
                preds = apply_with_fused_stem(model, variables, images_u8, ss)["preds"]
                out = batched_nms(preds, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, multi_label=False)
                return out["boxes"].sum() + out["scores"].sum() + out["valid"].sum()

            fcomp = jax.jit(predict_fused).lower(variables, img).compile()
            _ = float(fcomp(variables, img))
            fbest = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fcomp(variables, img) for _ in range(args.iters)]
                _ = float(sum(outs))
                fbest = min(fbest, max(time.perf_counter() - t0 - rt, 1e-9) / args.iters)
            print(
                f"yolo11{scale} b{batch} FUSED-STEM: {fbest*1e3:7.2f} ms measured | "
                f"vs baseline graph roofline: {sol/fbest*100:5.1f}% of "
                f"speed-of-light | {batch/fbest:7.0f} img/s "
                f"({best/fbest:4.2f}x vs unfused)"
            )

        if not args.train:
            continue

        from fce_yolo_tpu.train.loss import DetectionLossCfg
        from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
        from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

        tb = {"n": 128, "l": 16, "x": 8}.get(scale, 32)  # bench.py's rows
        tmodel, _, _ = build_model(args.cfg, scale=scale, nc=80)
        tvars = jax.jit(lambda k: init_variables(tmodel, k, imgsz=64))(jax.random.PRNGKey(0))
        tx = build_optimizer(OptimCfg(batch_size=tb, nbs=tb), tvars["params"])
        state0 = create_train_state(tmodel, tvars, tx)
        step = jax.jit(make_train_step(tmodel, tx, DetectionLossCfg(nc=80), bf16=True))
        m = 32
        tbatch = {
            "img": jnp.asarray(rng.randint(0, 255, (tb, args.imgsz, args.imgsz, 3), np.uint8)),
            "cls": jnp.asarray(rng.randint(0, 80, (tb, m)).astype(np.float32)),
            "bboxes": jnp.asarray(np.concatenate(
                [rng.uniform(0.3, 0.7, (tb, m, 2)), rng.uniform(0.05, 0.3, (tb, m, 2))], -1
            ).astype(np.float32)),
            "mask": jnp.asarray(rng.uniform(size=(tb, m)) < 0.8),
        }
        tcomp = jax.jit(step).lower(state0, tbatch).compile()
        ca = tcomp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        s, _ = tcomp(state0, tbatch)  # warmup (not donated here; analysis only)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            accs = []
            for _ in range(max(args.iters // 2, 8)):
                s, mtr = tcomp(s, tbatch)
                accs.append(mtr["loss"])
            _ = float(sum(accs))
            best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / max(args.iters // 2, 8))
        t_comp = flops / V5E_BF16_PEAK
        t_mem = byts / V5E_HBM_BW
        bound = "HBM" if t_mem > t_comp else "MXU"
        sol = max(t_comp, t_mem)
        print(
            f"yolo11{scale} TRAIN b{tb}: {best*1e3:7.2f} ms measured | "
            f"{flops/1e12:6.2f} TFLOP -> {t_comp*1e3:6.2f} ms MXU-roof | "
            f"{byts/1e9:6.1f} GB -> {t_mem*1e3:6.2f} ms HBM-roof | "
            f"{bound}-bound, {sol/best*100:5.1f}% of speed-of-light | "
            f"{tb/best:7.0f} img/s"
        )


if __name__ == "__main__":
    main()
