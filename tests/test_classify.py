"""Classification task: dataset, and an end-to-end overfit through the facade."""

import numpy as np
import pytest




def test_classification_dataset(tiny_cls_dataset):
    from fce_yolo_tpu.data.classify import ClassificationDataset, classify_collate

    ds = ClassificationDataset(tiny_cls_dataset + "/train", imgsz=64, mode="train")
    assert len(ds) == 16 and ds.names == {0: "class0", 1: "class1"}
    s = ds[0]
    assert s["img"].shape == (64, 64, 3) and s["label"] in (0, 1)
    b = classify_collate([ds[0], ds[8]])
    assert b["img"].shape == (2, 64, 64, 3) and set(b["label"]) == {0, 1}
    val = ClassificationDataset(tiny_cls_dataset + "/val", imgsz=64, mode="val")
    assert val[0]["img"].shape == (64, 64, 3)


@pytest.mark.slow
def test_classify_train_overfits(tiny_cls_dataset, tmp_path):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("yolo11n-cls.yaml", nc=2)
    # enough steps for the BN running averages (momentum 0.97) to converge —
    # eval uses running stats, so very short runs read as chance accuracy
    out = m.train(
        data=tiny_cls_dataset, epochs=30, batch=4, imgsz=64,
        optimizer="AdamW", lr0=0.002, warmup_epochs=0.0, momentum=0.9,
        project=str(tmp_path), name="c", verbose=False,
    )
    assert out["best_fitness"] > 0.9, out["results"][-1]  # trivial colors → near-perfect top1
    # reload best and predict
    m2 = YOLO(str(tmp_path / "c" / "weights" / "best"))
    assert m2.task == "classify"
