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


def test_visual_prompt_dataset_masks(tiny_dataset):
    import yaml

    from fce_yolo_tpu.data.multimodal import YOLOVisualPromptDataset

    d = yaml.safe_load(open(tiny_dataset))
    ds = YOLOVisualPromptDataset(f"{d['path']}/{d['train']}", imgsz=64,
                                 mode="train", nc=3, seed=0)
    s = ds[0]
    assert s["visual_prompts"].shape == (3, 8, 8)
    # every GT box is covered by its class's mask channel
    for b, c in zip(s["bboxes"], s["cls"].astype(int)):
        cy, cx = int((b[1] + b[3]) / 2 // 8), int((b[0] + b[2]) / 2 // 8)
        assert s["visual_prompts"][c, min(cy, 7), min(cx, 7)] == 1.0

    from fce_yolo_tpu.data.dataset import collate

    batch = collate([ds[0], ds[1]], max_labels=16)
    assert batch["visual_prompts"].shape == (2, 3, 8, 8)


@pytest.mark.slow
def test_yoloe_visual_prompt_train_freezes_all_but_savpe(tiny_dataset):
    """VP training (YOLOEVPTrainer analog): loss runs over SAVPE-scored
    logits and ONLY savpe params update."""
    import jax

    m = YOLOE("yoloe-11.yaml", nc=3)
    v0 = jax.tree_util.tree_map(np.array, m._ensure_variables(64)["params"])
    # nbs=4 -> accumulate 1; warmup off + fixed lr0 so 2 steps move params
    # visibly (the reference's 100-iter warmup clamp makes tiny runs ~1e-8)
    res = m.train_visual_prompt(data=tiny_dataset, epochs=1, batch=4, nbs=4,
                                imgsz=64, workers=1, val=False,
                                optimizer="SGD", lr0=0.01, warmup_epochs=0)
    assert res is not None
    v1 = m.variables["params"]
    moved, held = [], []
    for path, leaf in jax.tree_util.tree_leaves_with_path(v0):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        node = v1  # walk to the corresponding trained leaf
        for p in path:
            node = node[getattr(p, "key", p)]
        (moved if not np.allclose(leaf, np.asarray(node), atol=1e-7) else held).append(key)
    assert moved and all("savpe" in k for k in moved), moved[:5]
    assert any("savpe" not in k for k in held)


@pytest.mark.slow
def test_yoloe_seg_text_train_e2e(tiny_seg_dataset):
    """YOLOESegTrainer analog (reference models/yolo/yoloe/train_seg.py:13):
    the seg variant trains through the same text binding, with the segment
    loss (box+seg+cls+dfl) over contrastive logits. Also exercises the
    dataset-name re-bind: 3 classes are set here but the dataset has 2 —
    train must follow the dataset names like the reference YOLOEPETrainer
    (a stale 3-slot txt binding would shift the mask-coef slicing)."""
    m = YOLOE("yoloe-11-seg.yaml", nc=3)
    assert m.task == "segment"
    m.set_classes(["circle", "square", "tri"])
    res = m.train(data=tiny_seg_dataset, epochs=1, batch=4, imgsz=64,
                  workers=1, val=False)
    assert res is not None
    out = m.predict(np.zeros((64, 64, 3), np.uint8), imgsz=64)
    assert len(out) == 1 and out[0].masks is not None


@pytest.mark.slow
def test_yoloe_text_train_e2e(tiny_dataset):
    m = YOLOE("yoloe-11.yaml", nc=3)
    m.set_classes(["circle", "square", "tri"])
    res = m.train(data=tiny_dataset, epochs=1, batch=4, imgsz=64, workers=1, val=False)
    assert res is not None
    out = m.predict(np.zeros((64, 64, 3), np.uint8), imgsz=64)
    assert len(out) == 1
