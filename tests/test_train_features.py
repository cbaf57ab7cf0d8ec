"""Trainer features: layer freeze (masked updates) and exact-state resume."""

import numpy as np
import pytest


def test_freeze_mask_zeroes_updates():
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer, freeze_mask

    params = {
        "layers_0": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
        "layers_1": {"conv": {"kernel": jnp.ones((1, 1, 8, 8))}},
    }
    mask = freeze_mask(params, 1)
    assert mask["layers_0"]["conv"]["kernel"] is True
    assert mask["layers_1"]["conv"]["kernel"] is False

    cfg = OptimCfg(optimizer="SGD", warmup_epochs=0.0)
    tx = build_optimizer(cfg, params, freeze=1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["layers_0"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["layers_1"]["conv"]["kernel"]).sum()) > 0.0


@pytest.mark.slow
def test_resume_continues_training(tiny_dataset, tmp_path):
    from fce_yolo_tpu.api import YOLO
    from fce_yolo_tpu.experiments.analysis import load_results

    kw = dict(
        data=tiny_dataset, batch=4, imgsz=96, workers=2, max_labels=16,
        mosaic=0.0, optimizer="AdamW", lr0=0.005, warmup_epochs=0.0,
        close_mosaic=0, project=str(tmp_path), name="t", verbose=False, val=True,
    )
    m = YOLO("yolo11n.yaml", nc=3)
    m.train(epochs=3, **kw)
    rows1 = load_results(tmp_path / "t")
    assert len(rows1) == 3

    # resume to 6 epochs: continues from epoch 3, keeps optimizer state
    m2 = YOLO("yolo11n.yaml", nc=3)
    out = m2.train(epochs=6, resume=True, **kw)
    rows2 = out["results"]
    assert rows2[0]["epoch"] == 3 and rows2[-1]["epoch"] == 5
