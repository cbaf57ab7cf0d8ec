"""Host-fed SYSTEM throughput: image bytes on disk -> boxes (VERDICT r4 #3).

The chip benchmark (bench.py) deliberately pre-stages device inputs; this
tool measures the full system contract of the reference predictor
(engine/predictor.py:277, data/build.py:286): JPEG files -> threaded C++
decode+letterbox (native_decode_batch) -> H2D -> jitted e2e predict
(fold-BN + decode + NMS) -> detections, with the NEXT batch decoding on a
prefetch thread while the current one runs on the chip.

Reported components (all measured):
  host-decode img/s   threaded C++ JPEG decode+letterbox alone
  H2D MB/s            host->device staging rate for the batch tensor
  chip img/s          pipelined pure-device rate (bench.py method)
  SYSTEM img/s        full pipeline wall-clock over the dataset

Environment caveat (printed with the numbers): this box drives the TPU
through a network tunnel (H2D and result fetches cost ~28 ms RTT + tunnel
bandwidth) and has ONE CPU core (decode threads cannot scale). Both are
artifacts of the harness, not the design; on a real TPU VM the system rate
is min(host-decode, chip) with the H2D hidden by double buffering.

Run: python tools/bench_system.py [--n 512] [--batch 128] [--imgsz 640]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int, size_hw=(480, 640)) -> list:
    import cv2

    os.makedirs(root, exist_ok=True)
    paths = []
    rng = np.random.RandomState(0)
    for i in range(n):
        p = os.path.join(root, f"im{i:04d}.jpg")
        if not os.path.exists(p):
            img = np.full((*size_hw, 3), 110, np.uint8)
            img += rng.randint(0, 40, img.shape, np.uint8)
            for _ in range(3):
                x1, y1 = rng.randint(0, size_hw[1] - 60), rng.randint(0, size_hw[0] - 60)
                cv2.rectangle(img, (x1, y1), (x1 + 50, y1 + 50),
                              tuple(int(c) for c in rng.randint(0, 255, 3)), -1)
            cv2.imwrite(p, img)
        paths.append(p)
    return paths


def build_predict(scale: str, imgsz: int):
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, fold_conv_bn, init_variables
    from fce_yolo_tpu.nn.modules import fused_bn_scope
    from fce_yolo_tpu.ops.nms import batched_nms

    model, spec, strides = build_model("fce_yolo_tpu/cfg/models/yolo11.yaml", scale=scale)
    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
    variables = fold_conv_bn(variables)
    bf16 = jnp.bfloat16
    variables = {"params": jax.tree_util.tree_map(lambda x: x.astype(bf16), variables["params"]),
                 "batch_stats": variables["batch_stats"]}

    @jax.jit
    def predict(variables, images_u8):
        x = images_u8.astype(bf16) / 255.0
        preds = model.apply(variables, x, train=False)["preds"]
        out = batched_nms(preds, conf_thres=0.25, iou_thres=0.45,
                          max_det=300, multi_label=False)
        return out["boxes"], out["scores"], out["classes"], out["valid"]

    return predict, variables, fused_bn_scope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fce_yolo_tpu.data.native_loader import native_decode_batch

    paths = make_jpegs(f"/tmp/fy_sysbench_{args.imgsz}", args.n)
    B = args.batch
    batches = [paths[i:i + B] for i in range(0, len(paths) - B + 1, B)]

    # 1. host decode rate (threaded C++, buffer reuse)
    buf = np.empty((B, args.imgsz, args.imgsz, 3), np.uint8)
    _ = native_decode_batch(batches[0], args.imgsz, workers=args.workers, out=buf)
    t0 = time.perf_counter()
    for bp in batches:
        _ = native_decode_batch(bp, args.imgsz, workers=args.workers, out=buf)
    host_rate = (len(batches) * B) / (time.perf_counter() - t0)

    # 2. H2D staging rate
    host_batch, _m = native_decode_batch(batches[0], args.imgsz, workers=args.workers)
    dev = jax.device_put(host_batch)
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        dev = jax.device_put(host_batch)
        _ = np.asarray(dev[0, 0, 0])  # force completion (tunnel: block is a no-op)
    h2d_s = (time.perf_counter() - t0) / reps
    h2d_mbs = host_batch.nbytes / 1e6 / h2d_s

    # 3. chip-only rate (pipelined, pre-staged — bench.py method)
    predict, variables, scope = build_predict(args.scale, args.imgsz)
    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    rt = (time.perf_counter() - t0) / 10
    staged = [jax.device_put(host_batch) for _ in range(4)]
    with scope():
        out = predict(variables, staged[0])
    _ = np.asarray(out[1][0, 0])
    iters = 16
    t0 = time.perf_counter()
    outs = [predict(variables, staged[i % 4]) for i in range(iters)]
    _ = np.asarray(outs[-1][1][0, 0])
    chip_rate = (iters * B) / max(time.perf_counter() - t0 - rt, 1e-9)

    # 4. SYSTEM: decode (prefetch thread) -> H2D -> predict, double-buffered
    bufs = [np.empty((B, args.imgsz, args.imgsz, 3), np.uint8) for _ in range(2)]

    def decode_into(i, slot):
        return native_decode_batch(batches[i], args.imgsz,
                                   workers=args.workers, out=bufs[slot])[0]

    results = []
    with cf.ThreadPoolExecutor(1) as pool:
        t0 = time.perf_counter()
        fut = pool.submit(decode_into, 0, 0)
        for i in range(len(batches)):
            hb = fut.result()
            if i + 1 < len(batches):
                fut = pool.submit(decode_into, i + 1, (i + 1) % 2)
            dev = jax.device_put(hb)
            results.append(predict(variables, dev))
        # drain: force the last result out (full pipeline complete)
        _ = np.asarray(results[-1][1][0, 0])
        sys_wall = time.perf_counter() - t0
    sys_rate = (len(batches) * B) / sys_wall

    report = {
        "config": f"yolo11{args.scale} {args.imgsz}px b{B}, {len(batches)*B} jpegs",
        "host_decode_img_s": round(host_rate, 1),
        "h2d_MB_s": round(h2d_mbs, 1),
        "chip_img_s": round(chip_rate, 1),
        "system_img_s": round(sys_rate, 1),
        "bottleneck": (
            ("host-decode" if host_rate < chip_rate else "chip")
            if sys_rate >= 0.8 * min(host_rate, chip_rate)
            else "pipeline overhead (H2D / tunnel RTT)"
        ),
        "note": "1-CPU-core host + tunneled TPU (28ms RTT); on a TPU VM "
                "system ~= min(host_decode, chip) with H2D double-buffered",
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
