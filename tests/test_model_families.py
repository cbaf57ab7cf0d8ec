"""FastSAM / NAS / RTDETR facades (reference models/ layer)."""

import numpy as np
import pytest


def test_rtdetr_facade_builds():
    from fce_yolo_tpu.models import RTDETR

    m = RTDETR("rtdetr-l.yaml")
    assert m.task == "rtdetr"


def test_nas_requires_checkpoint(tmp_path):
    from fce_yolo_tpu.models import NAS

    with pytest.raises(FileNotFoundError):
        NAS("yolo_nas_s.pt")


def test_fastsam_prompts():
    """Box and point prompts select the right masks (reference
    FastSAMPredictor.prompt semantics on synthetic results)."""
    from fce_yolo_tpu.models.fastsam import FastSAM

    class Boxes:
        def __init__(self, n):
            self.cls = np.zeros(n)
            self.xyxy = np.array([[0, 0, 40, 40], [60, 60, 100, 100]], np.float32)
        def __getitem__(self, i):
            return self

    class Masks:
        def __init__(self):
            self.data = np.zeros((2, 100, 100), np.float32)
            self.data[0, 0:40, 0:40] = 1.0   # top-left object
            self.data[1, 60:100, 60:100] = 1.0  # bottom-right object

    class R:
        def __init__(self):
            self.boxes = Boxes(2)
            self.masks = Masks()
            self.orig_shape = (100, 100)

    # box prompt around the top-left object -> selects mask 0
    out = FastSAM.prompt([R()], bboxes=[[0, 0, 45, 45]])
    assert np.asarray(out[0].masks.data).shape[0] == 1
    assert out[0].masks.data[0, 10, 10] > 0.5

    # point prompt in the bottom-right object -> selects mask 1
    out = FastSAM.prompt([R()], points=[[80, 80]])
    assert np.asarray(out[0].masks.data).shape[0] == 1
    assert out[0].masks.data[0, 80, 80] > 0.5

    # background point removes everything
    out = FastSAM.prompt([R()], points=[[80, 80]], labels=[0])
    assert np.asarray(out[0].masks.data).shape[0] == 1  # all-kept minus bg hit


def test_yoloworld_set_classes_and_predict():
    """Open-vocab facade: set_classes rebinds names + embeddings; predict
    runs the text-conditioned graph end-to-end (offline hash embeddings)."""
    from fce_yolo_tpu.models import YOLOWorld

    m = YOLOWorld()
    m.set_classes(["cat", "dog", "bird"])
    assert m.names == {0: "cat", 1: "dog", 2: "bird"}
    assert m.txt_feats.shape == (1, 3, 512)
    img = np.full((96, 128, 3), 120, np.uint8)
    results = m.predict(img, imgsz=64, conf=0.0)
    assert len(results) == 1


def test_yoloworld_train_one_epoch(tiny_dataset):
    """World training: standard detection loss over text-scored class logits
    (reference WorldTrainer semantics) with bound hash embeddings."""
    from fce_yolo_tpu.models import YOLOWorldTrainable

    m = YOLOWorldTrainable(nc=3)
    m.set_classes(["circle", "square", "tri"])
    res = m.train(data=tiny_dataset, epochs=1, batch=4, imgsz=64, workers=1, val=False)
    assert res is not None
