"""Fused-stem follow-ups (VERDICT r4 weak #2): 1280px inference A/B and the
training-forward question.

1. 1280px e2e inference A/B for s/m (the stem stage is 4x larger than at
   640; round 4 only measured 640).
2. Forward-only A/B at the train batch shapes (eval mode) — the upper bound
   of what a stem-fused TRAINING forward could save.

The full training-step fusion itself is semantically barred for standard
training, documented in EVIDENCE round 5: the kernel consumes BN as folded
running stats, but train-mode BatchNorm computes CROSS-BATCH statistics
(a global reduction XLA emits across the batch/device mesh) and updates
them — folding would silently change training semantics (not
parity-preserving vs the reference trainer). The frozen-BN deterministic
step could legally use it via a custom-VJP + stem recompute, but that mode
exists for multichip determinism checks, not production throughput.

Run: python tools/stem_train_1280_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    rt = bench._roundtrip()
    stock = "fce_yolo_tpu/cfg/models/yolo11.yaml"
    print(f"# roundtrip {rt*1e3:.1f} ms")

    # 1. 1280px e2e inference A/B (fused stem on vs off)
    for scale, b in [("s", 8), ("m", 8)]:
        v1 = bench.bench_infer(stock, scale=scale, batch=b, imgsz=1280,
                               iters=8, rt=rt, fused_stem=True)
        v0 = bench.bench_infer(stock, scale=scale, batch=b, imgsz=1280,
                               iters=8, rt=rt, fused_stem=False)
        print(f"1280px e2e yolo11{scale} b{b}: fused {v1:7.1f} img/s vs "
              f"plain {v0:7.1f} img/s ({v1/v0:5.3f}x)", flush=True)

    # 2. forward-only A/B at train batch shapes (eval mode): upper bound of
    # a stem-fused train forward's win
    from fce_yolo_tpu.nn.model import build_model, fold_conv_bn, init_variables
    from fce_yolo_tpu.nn.modules import fused_bn_scope
    from fce_yolo_tpu.ops.pallas_stem import apply_with_fused_stem, stem_spec_from_model

    for scale, b in [("s", 64), ("m", 32)]:
        model, spec, strides = build_model(stock, scale=scale)
        ss = stem_spec_from_model(spec, (640, 640))
        if ss is None:
            print(f"fwd-only yolo11{scale}: stem not eligible")
            continue
        variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
        variables = fold_conv_bn(variables)
        bf16 = jnp.bfloat16
        variables = {"params": jax.tree_util.tree_map(lambda x: x.astype(bf16), variables["params"]),
                     "batch_stats": variables["batch_stats"]}

        def fwd_fused(v, img):
            return apply_with_fused_stem(model, v, img, ss)["preds"].sum()

        def fwd_plain(v, img):
            x = img.astype(bf16) / 255.0
            return model.apply(v, x, train=False)["preds"].sum()

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randint(0, 255, (b, 640, 640, 3), np.uint8))
        with fused_bn_scope():
            cf = jax.jit(fwd_fused).lower(variables, img).compile()
            cp = jax.jit(fwd_plain).lower(variables, img).compile()
        best = {}
        for name, c in (("fused", cf), ("plain", cp)):
            _ = float(c(variables, img))
            t_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [c(variables, img) for _ in range(16)]
                _ = float(sum(outs))
                t_best = min(t_best, max(time.perf_counter() - t0 - rt, 1e-9) / 16)
            best[name] = t_best
        print(f"fwd-only yolo11{scale} b{b} 640px: fused {best['fused']*1e3:7.2f} ms "
              f"vs plain {best['plain']*1e3:7.2f} ms "
              f"({best['plain']/best['fused']:5.3f}x) — upper bound of a "
              f"stem-fused train-forward win", flush=True)


if __name__ == "__main__":
    main()
