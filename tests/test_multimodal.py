"""Open-vocab data stack: random_load_text, YOLOMultiModalDataset,
GroundingDataset, YOLOConcatDataset, and the per-batch-text world train path
(reference data/dataset.py:311,407,642 + augment.py:2252 RandomLoadText +
models/yolo/world/train_world.py WorldTrainerFromScratch)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from fce_yolo_tpu.data.multimodal import (
    GroundingDataset,
    YOLOConcatDataset,
    YOLOMultiModalDataset,
    random_load_text,
)


def _sample(n=5, nc=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "cls": rng.integers(0, nc, n).astype(np.float32),
        "bboxes": rng.uniform(0, 100, (n, 4)).astype(np.float32),
        "segments": [np.zeros((4, 2), np.float32) + i for i in range(n)],
    }


CLASS_TEXTS = [[f"name{i}", f"syn{i}"] for i in range(10)]


class TestRandomLoadText:
    def test_remap_and_padding(self):
        rng = np.random.default_rng(1)
        s = _sample()
        orig_cls = s["cls"].astype(int).copy()
        out = random_load_text(s, CLASS_TEXTS, rng, max_samples=8,
                               neg_samples=(2, 4), padding_pool=["bg"])
        assert len(out["texts"]) == 8
        # every kept instance's text matches its original class name/synonym
        assert len(out["cls"]) == len(out["bboxes"]) == len(out["segments"])
        for new_c, old_c in zip(out["cls"].astype(int), orig_cls):
            assert out["texts"][new_c] in CLASS_TEXTS[old_c]

    def test_pos_overflow_drops_instances(self):
        rng = np.random.default_rng(2)
        s = {"cls": np.arange(10, dtype=np.float32),
             "bboxes": np.zeros((10, 4), np.float32)}
        out = random_load_text(s, CLASS_TEXTS, rng, max_samples=4,
                               neg_samples=(0, 0), padding_pool=["bg"])
        assert len(out["cls"]) == 4  # 6 positives dropped with their boxes
        assert out["cls"].max() < 4

    def test_negatives_within_range(self):
        rng = np.random.default_rng(3)
        s = {"cls": np.zeros(2, np.float32), "bboxes": np.zeros((2, 4), np.float32)}
        out = random_load_text(s, CLASS_TEXTS, rng, max_samples=10,
                               neg_samples=(3, 3), padding=False)
        assert len(out["texts"]) == 1 + 3  # one positive class + 3 negatives


@pytest.fixture(scope="module")
def mm_dataset(tiny_dataset):
    import yaml

    d = yaml.safe_load(open(tiny_dataset))
    root = d.get("path", "")
    train = f"{root}/{d['train']}" if root else d["train"]
    names = {0: "circle/disc", 1: "square/box", 2: "tri"}
    return YOLOMultiModalDataset(train, names=names, imgsz=64, mode="train",
                                 neg_samples=(1, 2), seed=0)


class TestMultiModalDataset:
    def test_sample_contract(self, mm_dataset):
        s = mm_dataset[0]
        assert len(s["texts"]) == mm_dataset.max_samples == 3
        assert s["txt_feats"].shape == (3, 512)
        assert s["txt_feats"].dtype == np.float32
        assert s["cls"].max() < 3 if len(s["cls"]) else True

    def test_synonyms_and_stats(self, mm_dataset):
        assert {"circle", "disc", "square", "box", "tri"} == mm_dataset.category_names
        freq = mm_dataset.category_freq
        assert freq["circle"] == freq["disc"] > 0
        assert set(mm_dataset._get_neg_texts(freq)) <= set(freq)

    def test_collate_carries_txt_feats(self, mm_dataset):
        from fce_yolo_tpu.data.dataset import collate

        batch = collate([mm_dataset[0], mm_dataset[1]], max_labels=16)
        assert batch["txt_feats"].shape == (2, 3, 512)


@pytest.fixture(scope="module")
def grounding_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("grounding")
    rng = np.random.RandomState(5)
    images, annotations = [], []
    captions = ["a red ball near a blue cup", "two green trees"]
    spans = [[("red ball", 2, 10), ("blue cup", 18, 26)], [("green trees", 4, 15)]]
    aid = 0
    for i, (cap, sp) in enumerate(zip(captions, spans)):
        h, w = 80, 100
        cv2.imwrite(str(root / f"img{i}.jpg"), rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i, "file_name": f"img{i}.jpg", "height": h,
                       "width": w, "caption": cap})
        for phrase, a, b in sp:
            assert cap[a:b] == phrase
            annotations.append({
                "id": aid, "image_id": i, "iscrowd": 0,
                "bbox": [10.0 + 20 * aid % 40, 10.0, 25.0, 30.0],
                "tokens_positive": [[a, b]],
            })
            aid += 1
    (root / "ann.json").write_text(json.dumps(
        {"images": images, "annotations": annotations}))
    return root


class TestGroundingDataset:
    def test_parse_and_sample(self, grounding_dir):
        ds = GroundingDataset(str(grounding_dir), str(grounding_dir / "ann.json"),
                              imgsz=64, mode="train", max_samples=4, seed=0)
        assert len(ds) == 2
        assert ds.labels[0]["cls"].tolist() == [0.0, 1.0]  # two phrases, image 0
        assert ds._image_texts[0] == [["red ball"], ["blue cup"]]
        np.testing.assert_allclose(
            ds.labels[0]["xywhn"][0], [(10 + 12.5) / 100, (10 + 15) / 80, 0.25, 30 / 80]
        )
        s = ds[0]
        assert len(s["texts"]) == 4 and s["txt_feats"].shape == (4, 512)
        # phrases ground the kept instances
        for c in s["cls"].astype(int):
            assert s["texts"][c] in ("red ball", "blue cup")
        assert not ds.mosaic_enabled and ds.hyp.mixup == 0.0

    def test_category_stats(self, grounding_dir):
        ds = GroundingDataset(str(grounding_dir), str(grounding_dir / "ann.json"),
                              imgsz=64, mode="val", max_samples=4)
        assert ds.category_names == {"red ball", "blue cup", "green trees"}
        assert ds.category_freq == {"red ball": 1, "blue cup": 1, "green trees": 1}


class TestConcatDataset:
    def test_indexing_and_epoch(self, mm_dataset, grounding_dir):
        g = GroundingDataset(str(grounding_dir), str(grounding_dir / "ann.json"),
                             imgsz=64, mode="train", max_samples=3, seed=0)
        cat = YOLOConcatDataset([mm_dataset, g])
        assert len(cat) == len(mm_dataset) + 2
        s_last = cat[len(cat) - 1]
        assert len(s_last["texts"]) == 3
        assert len(cat.labels) == len(cat)
        cat.set_epoch(1)
        with pytest.raises(AssertionError):
            cat[len(cat)]


@pytest.mark.slow
def test_world_train_multimodal_e2e(tiny_dataset):
    """Per-batch sampled-text world training end-to-end (facade)."""
    from fce_yolo_tpu.models import YOLOWorldTrainable

    m = YOLOWorldTrainable(nc=3)
    res = m.train_multimodal(data=tiny_dataset, epochs=1, batch=4, imgsz=64,
                             workers=1, val=False)
    assert res is not None
    # after training, fixed-class predict still works through the binding
    m.set_classes(["circle", "square", "tri"])
    out = m.predict(np.zeros((64, 64, 3), np.uint8), imgsz=64)
    assert len(out) == 1
