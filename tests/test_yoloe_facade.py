"""YOLOE facade: text-prompt and visual-prompt predict, text-prompt train
(reference models/yolo/yoloe/{model,predict,train}.py)."""

from __future__ import annotations

import numpy as np
import pytest

from fce_yolo_tpu import YOLOE


@pytest.fixture(scope="module")
def model():
    m = YOLOE("yoloe-11.yaml", nc=4)
    m.set_classes(["cat", "dog", "bird", "fish"])
    return m


def test_text_predict(model):
    img = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
    r = model.predict(img, imgsz=64, conf=0.0, max_det=8)
    assert len(r) == 1 and r[0].boxes.data.shape == (8, 6)
    assert model.names[1] == "dog"
    # boxes scaled back into source coordinates
    assert r[0].boxes.xyxy[:, [0, 2]].max() <= 128 + 1e-3
    assert r[0].boxes.xyxy[:, [1, 3]].max() <= 96 + 1e-3


def test_visual_prompt_predict(model):
    img = np.random.RandomState(1).randint(0, 255, (96, 128, 3), np.uint8)
    vp = {"bboxes": np.array([[10, 10, 60, 60], [70, 20, 120, 90]], np.float32),
          "cls": np.array([2, 7])}
    r = model.predict(img, visual_prompts=vp, imgsz=64, conf=0.0, max_det=8)
    assert len(r) == 1
    rows = r[0].boxes.data
    assert rows.shape == (8, 6)
    # predicted classes are the PROMPT ids, not slot indices
    assert set(rows[:, 5].astype(int)) <= {2, 7}


def test_prompt_masks_geometry():
    masks, q = YOLOE._prompt_masks(
        np.array([[0, 0, 64, 32], [64, 32, 128, 64], [0, 32, 64, 64]], np.float32),
        np.array([5, 5, 9]), imgsz=128, ratio=1.0, pad=(0.0, 0.0),
    )
    assert masks.shape == (1, 2, 16, 16) and list(q) == [5, 9]
    assert masks[0, 0, :4, :8].all() and masks[0, 0, 4:8, 8:].all()  # class 5 union
    assert masks[0, 1, 4:8, :8].all() and not masks[0, 1, :4].any()  # class 9


def test_seg_variant_builds():
    m = YOLOE("yoloe-11-seg.yaml", nc=3)
    assert m.task == "segment"
    assert m.spec.needs_text


@pytest.mark.slow
def test_yoloe_text_train_e2e(tiny_dataset):
    m = YOLOE("yoloe-11.yaml", nc=3)
    m.set_classes(["circle", "square", "tri"])
    res = m.train(data=tiny_dataset, epochs=1, batch=4, imgsz=64, workers=1, val=False)
    assert res is not None
    out = m.predict(np.zeros((64, 64, 3), np.uint8), imgsz=64)
    assert len(out) == 1
