"""Kernel-level profile of the full train step (VERDICT r2 next-step #1).

Reproduces bench.py's exact train config (yolo11n 640px batch64 bf16), then:
  1. times sub-jits: fwd / fwd+loss / value_and_grad / full step
  2. captures a jax.profiler device trace and prints the top-N TPU kernels
     by total duration (parsed from the perfetto trace json)

Run on the real chip:  python tools/profile_train.py [--scale n] [--batch 64]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(batch, imgsz, m=32, nc=80):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    return {
        "img": jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), np.uint8)),
        "cls": jnp.asarray(rng.randint(0, nc, (batch, m)).astype(np.float32)),
        "bboxes": jnp.asarray(np.concatenate(
            [rng.uniform(0.3, 0.7, (batch, m, 2)), rng.uniform(0.05, 0.3, (batch, m, 2))], -1
        ).astype(np.float32)),
        "mask": jnp.asarray(rng.uniform(size=(batch, m)) < 0.8),
    }


def _roundtrip():
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    return (time.perf_counter() - t0) / 10


def timeit(fn, args, iters=10, rt=0.0):
    """Pipelined best-of-3 ms (scalar-sync pattern from bench.py)."""
    _ = fn(*args)  # compiled by caller; warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        _ = float(sum(outs))
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / iters)
    return best * 1e3


def trace_and_report(trace_dir, top, run4):
    """Capture a device trace of run4() (which must run 4 iterations and
    sync) and print the top TPU kernels by total duration."""
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    run4()
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                              recursive=True), key=os.path.getmtime)
    if not traces:
        print("NO perfetto trace produced; files:",
              glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True))
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # aggregate complete events by name on TPU device tracks
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if e["name"].startswith("jit_"):
            continue  # module-level span; would double-count its kernels
        d = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[e["name"]] += d
        cnt_by_name[e["name"]] += 1
        total += d
    print(f"\n# top {top} TPU kernels over 4 steps (total {total:.1f} ms):")
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/4:9.3f} ms/step  x{cnt_by_name[name]//4:<4d} {name[:110]}")


def profile_infer(args):
    """Kernel profile of the e2e inference pipeline (bench.py's predict:
    normalize + forward + DFL decode + NMS in one jit)."""
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.ops.nms import batched_nms

    model, spec, strides = build_model(args.cfg, scale=args.scale)
    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
    bf16 = jnp.bfloat16
    variables = {"params": jax.tree_util.tree_map(lambda x: x.astype(bf16), variables["params"]),
                 "batch_stats": variables["batch_stats"]}

    def predict(variables, images_u8):
        x = images_u8.astype(bf16) / 255.0
        preds = model.apply(variables, x, train=False)["preds"]
        out = batched_nms(preds, conf_thres=0.25, iou_thres=0.45,
                          max_det=300, multi_label=False)
        return out["boxes"].sum() + out["scores"].sum() + out["valid"].sum()

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (args.batch, args.imgsz, args.imgsz, 3), np.uint8))
    compiled = jax.jit(predict).lower(variables, img).compile()
    rt = _roundtrip()
    print(f"# roundtrip {rt*1e3:.1f} ms  devices={jax.devices()}")
    _ = float(compiled(variables, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [compiled(variables, img) for _ in range(16)]
        _ = float(sum(outs))
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / 16)
    print(f"e2e infer       : {best*1e3:7.2f} ms  ({args.batch/best:7.0f} img/s)")

    if args.no_trace:
        return

    def run4():
        outs = [compiled(variables, img) for _ in range(4)]
        _ = float(sum(outs))

    trace_and_report(args.trace_dir, args.top, run4)


def _enable_compile_cache():
    import jax

    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             ".cache", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="fce_yolo_tpu/cfg/models/yolo11.yaml")
    ap.add_argument("--trace-dir", default="/tmp/fy_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--infer", action="store_true",
                    help="profile the e2e inference pipeline instead of the train step")
    args = ap.parse_args()
    _enable_compile_cache()

    if args.infer:
        profile_infer(args)
        return

    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.train.loss import DetectionLossCfg, detection_loss
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    model, spec, strides = build_model(args.cfg, scale=args.scale, nc=80)
    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
    tx = build_optimizer(OptimCfg(batch_size=args.batch, nbs=args.batch), variables["params"])
    state0 = create_train_state(model, variables, tx)
    loss_cfg = DetectionLossCfg(nc=80)
    step = jax.jit(make_train_step(model, tx, loss_cfg, bf16=True), donate_argnums=0)

    batch = make_batch(args.batch, args.imgsz)
    rt = _roundtrip()
    print(f"# roundtrip {rt*1e3:.1f} ms  devices={jax.devices()}")

    bf16 = jnp.bfloat16

    @jax.jit
    def fwd_only(params, bs, img):
        p = jax.tree_util.tree_map(lambda x: x.astype(bf16), params)
        x = img.astype(bf16) / 255.0
        out = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                          mutable=["batch_stats"])[0]
        return sum(f.astype(jnp.float32).sum() for f in out["feats"])

    def loss_fn(params, bs, batch, ls):
        p = jax.tree_util.tree_map(lambda x: x.astype(bf16), params)
        x = batch["img"].astype(bf16) / 255.0
        out, upd = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                               mutable=["batch_stats"])
        out = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), out)
        total, parts, nls = detection_loss(out["feats"], batch, loss_cfg, ls)
        return total, nls

    @jax.jit
    def fwd_loss(params, bs, batch, ls):
        return loss_fn(params, bs, batch, ls)[0]

    @jax.jit
    def fwd_bwd(params, bs, batch, ls):
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bs, batch, ls)
        return total + sum(jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32).sum(), jax.tree_util.tree_leaves(grads)))

    p, bs, ls = state0.params, state0.batch_stats, state0.loss_state
    t_f = timeit(fwd_only, (p, bs, batch["img"]), rt=rt)
    t_fl = timeit(fwd_loss, (p, bs, batch, ls), rt=rt)
    t_fb = timeit(fwd_bwd, (p, bs, batch, ls), rt=rt)

    def run_step(s):
        s2, m = step(s, batch)
        return s2, m["loss"]

    # full-step timing (donated state chain)
    s = state0
    s, _ = step(s, batch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        accs = []
        n = 16
        for _ in range(n):
            s, m = step(s, batch)
            accs.append(m["loss"])
        _ = float(sum(accs))
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / n)
    t_step = best * 1e3

    b = args.batch
    print(f"fwd only        : {t_f:7.1f} ms  ({b/t_f*1e3:7.0f} img/s)")
    print(f"fwd+loss        : {t_fl:7.1f} ms  ({b/t_fl*1e3:7.0f} img/s)")
    print(f"fwd+bwd(full)   : {t_fb:7.1f} ms  ({b/t_fb*1e3:7.0f} img/s)")
    print(f"full step       : {t_step:7.1f} ms  ({b/t_step*1e3:7.0f} img/s)")

    if args.no_trace:
        return

    # ---- kernel trace ----
    state_box = [s]

    def run4():
        for _ in range(4):
            s2, m = step(state_box[0], batch)
            state_box[0] = s2
        _ = float(m["loss"])

    trace_and_report(args.trace_dir, args.top, run4)


if __name__ == "__main__":
    main()
