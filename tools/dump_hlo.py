"""Dump the optimized HLO of the train step and summarize the named kernels
found hot by tools/profile_train.py."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_train import make_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="fce_yolo_tpu/cfg/models/yolo11.yaml")
    ap.add_argument("--out", default="/tmp/train_step_hlo.txt")
    args = ap.parse_args()

    import jax

    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.train.loss import DetectionLossCfg
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    model, spec, strides = build_model(args.cfg, scale=args.scale, nc=80)
    variables = jax.jit(lambda k: init_variables(model, k, imgsz=64))(jax.random.PRNGKey(0))
    tx = build_optimizer(OptimCfg(batch_size=args.batch, nbs=args.batch), variables["params"])
    state0 = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx, DetectionLossCfg(nc=80), bf16=True),
                   donate_argnums=0)
    batch = make_batch(args.batch, args.imgsz)
    compiled = step.lower(state0, batch).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)")
    ca = compiled.cost_analysis()
    if ca:
        print({k: v for k, v in ca.items() if k in ("flops", "bytes accessed")})


if __name__ == "__main__":
    main()
