"""Classification task: dataset, and an end-to-end overfit through the facade."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cls_dataset(tmp_path_factory):
    """Two visually-distinct classes (red-tinted vs blue-tinted noise textures;
    solid colors would give BatchNorm degenerate zero-variance activations)."""
    import cv2

    root = tmp_path_factory.mktemp("tinycls")
    rng = np.random.RandomState(0)
    for split, n in (("train", 16), ("val", 8)):
        for ci in range(2):
            d = root / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(n // 2):
                img = rng.randint(0, 120, (64, 64, 3), dtype=np.uint8)
                img[..., 2 if ci == 0 else 0] += 120  # strong red / blue tint
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return str(root)


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
