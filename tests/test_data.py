"""Data layer: letterbox geometry, augment invariants, dataset scan, loader shapes."""

from pathlib import Path

import numpy as np
import pytest

from fce_yolo_tpu.data import (
    AugmentCfg,
    DataLoader,
    YOLODataset,
    check_det_dataset,
    collate,
    letterbox,
)
from fce_yolo_tpu.data.augment import mosaic4, random_flip, random_hsv, random_perspective


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    out, r, (pw, ph) = letterbox(img, 640)
    assert out.shape == (640, 640, 3)
    assert abs(r - 3.2) < 1e-9  # 640/200
    assert pw == 0 and ph == 160
    # no-scaleup path keeps small images small
    out2, r2, _ = letterbox(img, 640, scaleup=False)
    assert r2 == 1.0  # upscaling suppressed
    out3, r3, _ = letterbox(np.zeros((1000, 1000, 3), np.uint8), 640, scaleup=False)
    assert r3 == pytest.approx(0.64)


def test_letterbox_rect_stride_align():
    img = np.zeros((100, 200, 3), np.uint8)
    out, r, _ = letterbox(img, 640, rect=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] < 640  # minimal padding, not full square


def test_random_flip_box_math():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    s = {"img": img, "cls": np.array([0.0]), "bboxes": boxes}
    out = random_flip(s, rng, AugmentCfg(fliplr=1.0, flipud=0.0))
    np.testing.assert_allclose(out["bboxes"], [[70, 20, 90, 40]])


def test_random_hsv_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = np.random.randint(0, 255, (64, 64, 3), np.uint8)
    out = random_hsv(img, rng, AugmentCfg())
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mosaic4_canvas_and_labels():
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(4):
        img = np.random.randint(0, 255, (80, 120, 3), np.uint8)
        samples.append(
            {"img": img, "cls": np.array([1.0]), "bboxes": np.array([[10.0, 10.0, 60.0, 60.0]])}
        )
    out = mosaic4(samples, 160, rng)
    assert out["img"].shape == (320, 320, 3)
    assert len(out["cls"]) >= 1
    assert (out["bboxes"] >= 0).all() and (out["bboxes"] <= 320).all()


def test_random_perspective_identity_keeps_boxes():
    rng = np.random.default_rng(0)
    cfg = AugmentCfg(degrees=0, translate=0, scale=0, shear=0, perspective=0)
    img = np.random.randint(0, 255, (64, 64, 3), np.uint8)
    s = {"img": img, "cls": np.array([0.0]), "bboxes": np.array([[8.0, 8.0, 40.0, 40.0]])}
    out = random_perspective(s, rng, cfg)
    assert out["img"].shape == (64, 64, 3)
    np.testing.assert_allclose(out["bboxes"], s["bboxes"], atol=1e-3)


def test_check_det_dataset(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    assert d["nc"] == 3 and d["names"][0] == "circle"
    assert d["train"].endswith("images/train")


def test_dataset_registry_resolution(tmp_path, monkeypatch):
    """Bare names resolve against the packaged cfg/datasets registry.

    Reference users write data=coco8.yaml with no path (data/utils.py
    check_det_dataset); the packaged registry makes that work here, with a
    no-download error that carries the original source URL.
    """
    import pytest

    from fce_yolo_tpu.data.dataset import _resolve_dataset_yaml

    # bare name, with and without suffix
    p = _resolve_dataset_yaml("coco8.yaml")
    assert p.exists() and p.parent.name == "datasets"
    assert _resolve_dataset_yaml("coco8") == p
    # pose metadata carried through
    import yaml as _yaml
    pose = _yaml.safe_load(_resolve_dataset_yaml("coco8-pose.yaml").read_text())
    assert pose["kpt_shape"] == [17, 3] and len(pose["flip_idx"]) == 17
    # unknown name lists the registry
    with pytest.raises(FileNotFoundError, match="packaged registry"):
        _resolve_dataset_yaml("definitely-not-a-dataset.yaml")
    # data absent locally -> FileNotFoundError citing the download URL
    monkeypatch.setenv("FY_DATASETS_DIR", str(tmp_path / "nowhere"))
    with pytest.raises(FileNotFoundError, match="original source"):
        check_det_dataset("coco8.yaml")
    # names table intact for the fork's 80-class COCO family
    import fce_yolo_tpu.data.dataset as dsmod
    d = _yaml.safe_load(_resolve_dataset_yaml("coco128.yaml").read_text())
    assert len(d["names"]) == 80 and d["names"][79] == "toothbrush"


def test_dataset_val_mode(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=128, mode="val")
    assert len(ds) == 4
    s = ds[0]
    assert s["img"].shape == (128, 128, 3)
    assert "ratio" in s and "orig_shape" in s
    # boxes inside the letterboxed frame
    if len(s["bboxes"]):
        assert (s["bboxes"] >= -1).all() and (s["bboxes"] <= 129).all()


def test_dataset_train_mode_and_collate(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", seed=1)
    samples = [ds[i] for i in range(4)]
    for s in samples:
        assert s["img"].shape == (96, 96, 3) and s["img"].dtype == np.uint8
    batch = collate(samples, max_labels=32)
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["cls"].shape == (4, 32)
    assert batch["bboxes"].shape == (4, 32, 4)
    assert batch["mask"].dtype == bool
    # normalized xywh in [0, 1]
    assert (batch["bboxes"][batch["mask"]] >= 0).all()
    assert (batch["bboxes"][batch["mask"]] <= 1.0 + 1e-6).all()


def test_dataloader_shapes_and_epochs(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train", seed=1)
    dl = DataLoader(ds, batch_size=4, workers=2, max_labels=16, seed=0)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert all(b["img"].shape == (4, 96, 96, 3) for b in batches)
    # different epoch -> different order (reseeded)
    dl.set_epoch(1)
    batches2 = list(dl)
    assert len(batches2) == 2


def test_dataloader_val_tail_padding(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["val"], imgsz=96, mode="val")
    dl = DataLoader(ds, batch_size=3, shuffle=False, workers=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["n_valid"] == 3 and batches[1]["n_valid"] == 1
    assert batches[1]["img"].shape == (3, 96, 96, 3)  # padded, static


def test_mosaic_close(tiny_dataset):
    d = check_det_dataset(tiny_dataset)
    ds = YOLODataset(d["train"], imgsz=96, mode="train")
    assert ds.mosaic_enabled
    ds.set_epoch(95, close_mosaic_at=10, total_epochs=100)
    assert not ds.mosaic_enabled


def test_copy_paste():
    from fce_yolo_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    a = {
        "img": np.zeros((100, 100, 3), np.uint8),
        "cls": np.array([0.0]),
        "bboxes": np.array([[5.0, 5.0, 20.0, 20.0]]),
        "segments": [np.array([[5, 5], [20, 5], [20, 20], [5, 20]], np.float32)],
    }
    b = {
        "img": np.full((100, 100, 3), 200, np.uint8),
        "cls": np.array([1.0]),
        "bboxes": np.array([[40.0, 40.0, 80.0, 80.0]]),
        "segments": [np.array([[40, 40], [80, 40], [80, 80], [40, 80]], np.float32)],
    }
    out = copy_paste(a, b, rng, p=1.0)
    assert len(out["cls"]) == 2 and out["cls"][1] == 1.0
    # pasted region carries donor pixels
    assert out["img"][60, 60].mean() > 150
    assert out["img"][2, 2].mean() < 10
    # box-only donor: no-op
    out2 = copy_paste(a, {"img": b["img"], "cls": b["cls"], "bboxes": b["bboxes"]}, rng)
    assert len(out2["cls"]) == 1


def test_convert_coco(tmp_path):
    import json

    from fce_yolo_tpu.data.converter import convert_coco

    ann = {
        "images": [{"id": 1, "file_name": "im1.jpg", "width": 200, "height": 100}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [50, 25, 100, 50], "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "iscrowd": 1},  # skipped
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(ann))
    out = convert_coco(p, tmp_path / "labels")
    rows = (out / "im1.txt").read_text().strip().splitlines()
    assert len(rows) == 1
    cls, cx, cy, w, h = rows[0].split()
    assert cls == "0" and float(cx) == 0.5 and float(cy) == 0.5
    assert float(w) == 0.5 and float(h) == 0.5


def test_label_cache_invalidation(tmp_path):
    """Editing a label file must invalidate the parsed-label cache."""
    import cv2

    img_dir = tmp_path / "images" / "t"
    lbl_dir = tmp_path / "labels" / "t"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((32, 32, 3), np.uint8))
    (lbl_dir / "a.txt").write_text("0 0.5 0.5 0.5 0.5\n")

    ds1 = YOLODataset(str(img_dir), imgsz=32, mode="val")
    assert len(ds1.labels[0]["cls"]) == 1

    import os
    import time

    time.sleep(0.01)
    (lbl_dir / "a.txt").write_text("0 0.5 0.5 0.5 0.5\n1 0.3 0.3 0.2 0.2\n")
    os.utime(lbl_dir / "a.txt")
    ds2 = YOLODataset(str(img_dir), imgsz=32, mode="val")
    assert len(ds2.labels[0]["cls"]) == 2


def test_mosaic9_canvas_and_labels():
    """9-grid mosaic yields a (2s, 2s) canvas with clipped in-bounds boxes."""
    from fce_yolo_tpu.data.augment import mosaic9

    rng = np.random.default_rng(0)
    samples = []
    for i in range(9):
        h, w = 80 + 5 * i, 100 - 3 * i
        img = np.full((h, w, 3), i * 20, np.uint8)
        samples.append({
            "img": img,
            "cls": np.array([float(i % 3)], np.float32),
            "bboxes": np.array([[10, 10, w - 10, h - 10]], np.float32),
        })
    s = 64
    out = mosaic9(samples, s, rng)
    assert out["img"].shape == (2 * s, 2 * s, 3)
    assert len(out["cls"]) == len(out["bboxes"])
    if len(out["bboxes"]):
        b = out["bboxes"]
        assert (b >= 0).all() and (b <= 2 * s).all()
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_rect_val_batches(tiny_dataset):
    """Rect val: aspect-sorted order, stride-aligned per-batch shapes
    (reference data/base.py:349 set_rectangle)."""
    from fce_yolo_tpu.data.dataset import YOLODataset, collate

    from pathlib import Path

    root = Path(tiny_dataset).parent
    ds = YOLODataset(
        str(root / "images" / "val"), imgsz=128, mode="val",
        rect=True, stride=32, batch_size=2,
    )
    assert ds.batch_shapes is not None
    assert (ds.batch_shapes % 32 == 0).all()
    # images in one batch share one target shape; batches stack cleanly
    for b0 in range(len(ds) // 2):
        samples = [ds[b0 * 2], ds[b0 * 2 + 1]]
        assert samples[0]["img"].shape == samples[1]["img"].shape
        batch = collate(samples, max_labels=16)
        exp_h, exp_w = ds.batch_shapes[b0]
        assert batch["img"].shape[1:3] == (exp_h, exp_w)
    # aspect ratios are sorted after the rect re-order
    import cv2 as _cv2

    ars = []
    for f in ds.im_files:
        im = _cv2.imread(f)
        ars.append(im.shape[0] / im.shape[1])
    assert ars == sorted(ars)


def test_image_cache_ram_and_disk(tiny_dataset):
    """RAM/disk caches reproduce identical samples (reference base.py:263)."""
    from fce_yolo_tpu.data.dataset import YOLODataset

    kw = dict(imgsz=96, mode="val")
    from pathlib import Path

    val = str(Path(tiny_dataset).parent / "images" / "val")
    base = YOLODataset(val, **kw)
    ram = YOLODataset(val, cache="ram", **kw)
    disk = YOLODataset(val, cache="disk", **kw)
    assert ram.cache == "ram" and ram._ims is not None
    assert disk.cache == "disk"
    for i in range(len(base)):
        ref = base[i]["img"]
        np.testing.assert_array_equal(ram[i]["img"], ref)
        np.testing.assert_array_equal(disk[i]["img"], ref)
    # disk cache wrote .npy siblings
    assert any(f.exists() for f in disk._npy_files)
    for f in disk._npy_files:
        f.unlink(missing_ok=True)


def test_load_tensor_and_stream(tiny_dataset, tmp_path):
    """LoadTensor validates layouts; LoadStreams drives a file-backed stream."""
    import cv2

    from fce_yolo_tpu.data.loaders import LoadStreams, LoadTensor

    lt = LoadTensor(np.zeros((2, 3, 32, 32), np.float32))  # BCHW floats
    frames = [f for _, (f,) in lt]
    assert len(frames) == 2 and frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8
    with pytest.raises(ValueError):
        LoadTensor(np.full((1, 3, 8, 8), 7.0, np.float32))  # un-normalized

    # synthesize a tiny video; treat it as a stream
    vid = tmp_path / "s.avi"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
    for i in range(10):
        vw.write(np.full((48, 64, 3), i * 20, np.uint8))
    vw.release()
    streams = LoadStreams(str(vid), buffer=True)
    got = 0
    try:
        for _src, frames in streams:
            assert frames[0].shape == (48, 64, 3)
            got += 1
            if got >= 5:
                break
    except StopIteration:
        pass
    streams.close()
    assert got >= 3


def test_split_dota(tmp_path):
    """Window grid + IoF label assignment + patch writing (reference
    data/split_dota.py)."""
    import cv2

    from fce_yolo_tpu.data.split_dota import bbox_iof, get_windows, split_trainval

    win = get_windows((500, 900), crop_sizes=(400,), gaps=(100,))
    assert (win[:, 2] - win[:, 0] == 400).all()
    assert win[:, 2].max() <= 900 and win[:, 3].max() <= 500
    # full containment -> IoF 1; disjoint -> 0
    poly = np.array([[10, 10, 50, 10, 50, 50, 10, 50]], np.float64)
    iof = bbox_iof(poly, np.array([[0, 0, 100, 100], [200, 200, 300, 300]], np.float64))
    assert abs(iof[0, 0] - 1.0) < 1e-6 and iof[0, 1] == 0.0
    # half-overlap window
    iof2 = bbox_iof(poly, np.array([[30, 0, 100, 100]], np.float64))
    assert abs(iof2[0, 0] - 0.5) < 1e-6

    root = tmp_path / "dota"
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        img = np.full((300, 520, 3), 90, np.uint8)
        cv2.imwrite(str(root / "images" / split / "a.png"), img)
        (root / "labels" / split / "a.txt").write_text(
            "0 0.1 0.1 0.3 0.1 0.3 0.3 0.1 0.3\n1 0.9 0.8 0.98 0.8 0.98 0.95 0.9 0.95\n"
        )
    out = tmp_path / "split"
    split_trainval(str(root), str(out), crop_size=256, gap=64)
    imgs = list((out / "images" / "train").glob("*.jpg"))
    lbls = list((out / "labels" / "train").glob("*.txt"))
    assert imgs and lbls
    # labels re-normalized to the window frame; corners may poke slightly
    # outside when a kept (IoF >= 0.7) box straddles the window edge — the
    # reference writes those unclipped too (split_dota.py:210-216)
    for lp in lbls:
        for row in lp.read_text().splitlines():
            vals = np.array(row.split()[1:], np.float64)
            assert len(vals) == 8
            assert (vals >= -0.5).all() and (vals <= 1.5).all()


def test_autosplit_and_classify_split(tmp_path):
    """Dataset splitting utilities (reference data/split.py)."""
    import cv2

    from fce_yolo_tpu.data.split import autosplit, split_classify_dataset

    img_dir = tmp_path / "ds" / "images"
    lbl_dir = tmp_path / "ds" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(20):
        cv2.imwrite(str(img_dir / f"{i:02d}.jpg"), np.full((16, 16, 3), i * 10, np.uint8))
        if i % 2 == 0:
            (lbl_dir / f"{i:02d}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    txts = autosplit(img_dir, weights=(0.8, 0.2, 0.0))
    lines = sum(len(t.read_text().splitlines()) for t in txts)
    assert lines == 20
    txts2 = autosplit(img_dir, annotated_only=True)
    lines2 = sum(len(t.read_text().splitlines()) for t in txts2)
    assert lines2 == 10

    cls_root = tmp_path / "cls"
    for c in ("a", "b"):
        (cls_root / c).mkdir(parents=True)
        for i in range(10):
            cv2.imwrite(str(cls_root / c / f"{i}.jpg"), np.zeros((8, 8, 3), np.uint8))
    out = split_classify_dataset(cls_root, train_ratio=0.8)
    assert len(list((out / "train" / "a").iterdir())) == 8
    assert len(list((out / "val" / "b").iterdir())) == 2


# --------------------------------------------------------------- auto_annotate
class _StubDetector:
    """Minimal .predict(source)->Results detector for annotator tests."""

    def __init__(self, img_dir, boxes):
        self.img_dir = Path(img_dir)
        self.box_rows = np.asarray(boxes, np.float32)  # (N, 6) xyxy conf cls

    def predict(self, source, **kw):
        import cv2

        from fce_yolo_tpu.engine.results import Results

        out = []
        for p in sorted(self.img_dir.iterdir()):
            img = cv2.imread(str(p))
            out.append(Results(img, str(p), {0: "thing", 1: "other"}, boxes=self.box_rows))
        return out


class _FakeSAM:
    """Deterministic SAM stand-in: each box prompt returns its own filled
    rectangle as the mask (original frame), so polygon math is checkable."""

    def predict(self, img, bboxes=None, **kw):
        from types import SimpleNamespace

        h, w = img.shape[:2]
        masks = np.zeros((len(bboxes), h, w), bool)
        for i, (x1, y1, x2, y2) in enumerate(np.asarray(bboxes, int)):
            masks[i, y1:y2, x1:x2] = True
        return SimpleNamespace(masks=masks, scores=np.ones(len(bboxes)))


def test_auto_annotate_detect_boxes(tmp_path):
    """Detect-only path writes normalized xywh rows."""
    import cv2

    from fce_yolo_tpu.data.annotator import auto_annotate

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.full((100, 200, 3), 128, np.uint8))
    det = _StubDetector(img_dir, [[20, 10, 60, 50, 0.9, 0], [100, 20, 180, 80, 0.8, 1]])
    out = auto_annotate(img_dir, det)
    rows = (out / "a.txt").read_text().splitlines()
    assert len(rows) == 2
    c, cx, cy, bw, bh = rows[0].split()
    assert c == "0"
    assert float(cx) == pytest.approx(40 / 200) and float(cy) == pytest.approx(30 / 100)
    assert float(bw) == pytest.approx(40 / 200) and float(bh) == pytest.approx(40 / 100)
    # classes filter drops the other class
    out2 = auto_annotate(img_dir, det, classes=[1], output_dir=tmp_path / "only1")
    assert (out2 / "a.txt").read_text().startswith("1 ")


def test_auto_annotate_sam_polygons_exact(tmp_path):
    """Det->SAM path: polygon rows trace the SAM mask in the original frame."""
    import cv2

    from fce_yolo_tpu.data.annotator import auto_annotate

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "b.jpg"), np.full((100, 200, 3), 90, np.uint8))
    det = _StubDetector(img_dir, [[20, 10, 60, 50, 0.9, 0]])
    out = auto_annotate(img_dir, det, sam_model=_FakeSAM())
    row = (out / "b.txt").read_text().split()
    cls, coords = int(row[0]), np.asarray(row[1:], np.float64).reshape(-1, 2)
    assert cls == 0 and len(coords) >= 4
    # polygon spans exactly the normalized rectangle (cv2 contour is inclusive)
    assert coords[:, 0].min() == pytest.approx(20 / 200)
    assert coords[:, 0].max() == pytest.approx(59 / 200)
    assert coords[:, 1].min() == pytest.approx(10 / 100)
    assert coords[:, 1].max() == pytest.approx(49 / 100)


def test_auto_annotate_real_sam_pipeline(tmp_path):
    """End-to-end with the real (random-init, tiny) SAM: boxes prompt the
    promptable predictor; any written rows are valid YOLO polygon rows."""
    import cv2

    from fce_yolo_tpu.data.annotator import auto_annotate
    from fce_yolo_tpu.models.sam import SAM

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "c.jpg"), rng.randint(0, 255, (96, 80, 3), np.uint8))
    det = _StubDetector(img_dir, [[10, 10, 60, 70, 0.9, 0]])
    sam = SAM(variant="sam_b", img_size=128, _random_init=True)
    out = auto_annotate(img_dir, det, sam_model=sam)
    assert out.is_dir()
    f = out / "c.txt"
    if f.exists():  # random-init masks may be empty; rows must still be valid
        for line in f.read_text().splitlines():
            vals = line.split()
            assert int(vals[0]) == 0 and len(vals[1:]) % 2 == 0 and len(vals[1:]) >= 6
            assert all(-0.01 <= float(v) <= 1.01 for v in vals[1:])


# ------------------------------------------------------------- new converters
def test_coco_class_maps_roundtrip():
    from fce_yolo_tpu.data.converter import coco80_to_coco91_class, coco91_to_coco80_class

    fwd, inv = coco91_to_coco80_class(), coco80_to_coco91_class()
    assert len(inv) == 80 and len(fwd) == 91
    for c80, c91 in enumerate(inv):
        assert fwd[c91 - 1] == c80  # inverse property


def test_merge_multi_segment_contains_all_points():
    from fce_yolo_tpu.data.converter import merge_multi_segment, min_index

    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    b = a + 100
    i, j = min_index(a, b)
    assert (i, j) == (2, 0)  # (10,10) vs (100,100)
    merged = merge_multi_segment([a.reshape(-1).tolist(), b.reshape(-1).tolist()])[0]
    pts = {tuple(p) for p in merged}
    assert {tuple(p) for p in a} <= pts and {tuple(p) for p in b} <= pts


def test_convert_segment_masks_to_yolo_seg(tmp_path):
    import cv2

    from fce_yolo_tpu.data.converter import convert_segment_masks_to_yolo_seg

    masks = tmp_path / "masks"
    masks.mkdir()
    m = np.zeros((100, 200), np.uint8)
    m[10:50, 20:80] = 1     # class 0 region
    m[60:90, 120:180] = 3   # class 2 region
    cv2.imwrite(str(masks / "a.png"), m)
    out = convert_segment_masks_to_yolo_seg(masks, tmp_path / "labels", classes=3)
    rows = (out / "a.txt").read_text().splitlines()
    assert sorted(int(r.split()[0]) for r in rows) == [0, 2]
    for r in rows:
        vals = np.asarray(r.split()[1:], np.float64)
        assert len(vals) % 2 == 0 and (0 <= vals).all() and (vals <= 1).all()
    cls0 = rows[0] if rows[0].split()[0] == "0" else rows[1]
    xs0 = np.asarray(cls0.split()[1:], np.float64)[0::2]
    assert xs0.min() == pytest.approx(20 / 200) and xs0.max() == pytest.approx(79 / 200)


def test_convert_dota_to_yolo_obb(tmp_path):
    import cv2

    from fce_yolo_tpu.data.converter import convert_dota_to_yolo_obb

    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train_original").mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "images" / "train" / "P0001.png"),
                np.zeros((100, 200, 3), np.uint8))
    (tmp_path / "labels" / "train_original" / "P0001.txt").write_text(
        "20 10 60 10 60 40 20 40 plane 0\n"
        "0 0 10 0 10 10 0 10 unknown-class 0\n"
    )
    convert_dota_to_yolo_obb(tmp_path)
    rows = (tmp_path / "labels" / "train" / "P0001.txt").read_text().splitlines()
    assert len(rows) == 1  # unknown class skipped
    vals = rows[0].split()
    assert vals[0] == "0"  # plane
    np.testing.assert_allclose(
        np.asarray(vals[1:], np.float64),
        [20 / 200, 10 / 100, 60 / 200, 10 / 100, 60 / 200, 40 / 100, 20 / 200, 40 / 100],
    )


def test_yolo_bbox2segment(tmp_path):
    import cv2

    from fce_yolo_tpu.data.converter import yolo_bbox2segment

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    cv2.imwrite(str(tmp_path / "images" / "x.jpg"), np.full((100, 200, 3), 80, np.uint8))
    (tmp_path / "labels" / "x.txt").write_text("1 0.2 0.3 0.2 0.4\n")  # box 20..60 x 10..50
    out = yolo_bbox2segment(tmp_path / "images", sam_model=_FakeSAM())
    row = (out / "x.txt").read_text().split()
    assert int(row[0]) == 1
    coords = np.asarray(row[1:], np.float64).reshape(-1, 2)
    assert coords[:, 0].min() == pytest.approx(20 / 200)
    assert coords[:, 1].max() == pytest.approx(49 / 100)


def test_convert_to_multispectral(tmp_path):
    import cv2

    from fce_yolo_tpu.data.converter import convert_to_multispectral

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 100  # B
    img[..., 1] = 150  # G
    img[..., 2] = 250  # R
    p = tmp_path / "a.jpg"
    cv2.imwrite(str(p), img)
    convert_to_multispectral(p, n_channels=5)
    ok, planes = cv2.imreadmulti(str(tmp_path / "a.tiff"), flags=cv2.IMREAD_GRAYSCALE)
    assert ok and len(planes) == 5
    # target 450nm extrapolates below B(475): value < B plane's 100
    assert planes[0].mean() < 100
    # mid target between G(510) and R(650) sits between their values
    assert 150 <= planes[2].mean() <= 250


def test_polygon_mask_helpers():
    from fce_yolo_tpu.data import polygon2mask, polygons2masks, polygons2masks_overlap

    sq = np.array([10, 10, 40, 10, 40, 40, 10, 40], np.float64)
    big = np.array([0, 0, 60, 0, 60, 60, 0, 60], np.float64)
    m = polygon2mask((64, 64), [sq])
    assert m.shape == (64, 64) and m[20, 20] == 1 and m[50, 50] == 0
    md = polygon2mask((64, 64), [sq], downsample_ratio=2)
    assert md.shape == (32, 32)
    ms = polygons2masks((64, 64), [sq, big])
    assert ms.shape == (2, 64, 64)
    overlap, order = polygons2masks_overlap((64, 64), [sq, big])
    # big drawn first (area-desc), small overwrites: pixel inside both = small's index
    assert list(order) == [1, 0]
    assert overlap[20, 20] == 2  # small instance rank 2 wins the overlap
    assert overlap[50, 50] == 1  # big-only region keeps rank 1


def test_albumentations_bridge_graceful():
    """Reference data/augment.py:1775 bridge: package absent -> exact no-op."""
    import numpy as np

    from fce_yolo_tpu.data.augment import Albumentations

    a = Albumentations()
    s = {"img": np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8),
         "cls": np.zeros((0,)), "bboxes": np.zeros((0, 4))}
    before = s["img"].copy()
    out = a(s, np.random.default_rng(1))
    if a.transform is None:  # this environment: albumentations not installed
        np.testing.assert_array_equal(out["img"], before)
    else:  # with the package: image may change, geometry never does
        assert out["img"].shape == before.shape
