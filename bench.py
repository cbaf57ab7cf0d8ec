"""Benchmark: batched 640px inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): torch-CPU ONNX yolo11n = 56.1 ms/img => 17.8
images/sec. North star: >= 3x that per chip. The pipeline measured here is
the full device-side predict path: normalize -> forward -> DFL decode ->
sigmoid -> NMS (top-k + pick/suppress scan), i.e. images in, boxes out.
"""

from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMG_S = 1000.0 / 56.1  # yolo11n CPU ONNX (README_Ultralytics.md:135)


def main(batch: int = 32, iters: int = 10, scale: str = "n", imgsz: int = 640) -> dict:
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.ops.nms import batched_nms

    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11.yaml", scale=scale)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, imgsz, imgsz, 3)), train=True)
    )(jax.random.PRNGKey(0))

    # bf16 weights/activations (MXU-native); decode upcasts to f32 internally
    bf16 = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: x.astype(bf16), variables["params"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    @jax.jit
    def predict(variables, images_u8):
        x = images_u8.astype(bf16) / 255.0
        preds = model.apply(variables, x, train=False)["preds"]
        return batched_nms(preds, conf_thres=0.25, iou_thres=0.45, max_det=300)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    out = predict(variables, imgs)
    jax.block_until_ready(out["boxes"])  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(variables, imgs)
        jax.block_until_ready(out["boxes"])
    dt = (time.perf_counter() - t0) / iters
    img_s = batch / dt

    result = {
        "metric": f"yolo11{scale} {imgsz}px batch{batch} e2e infer (fwd+decode+NMS) images/sec/chip",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / TORCH_CPU_BASELINE_IMG_S, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
