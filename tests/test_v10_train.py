"""YOLOv10 end-to-end train smoke: dual-assignment loss + NMS-free val."""

import numpy as np
import pytest


def test_v10_train_one_epoch(tiny_dataset):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("/root/reference/ultralytics/cfg/models/v10/yolov10n.yaml")
    res = m.train(data=tiny_dataset, epochs=1, batch=4, imgsz=64, workers=1, val=False)
    assert res is not None


def test_v10_predict(tiny_dataset):
    from fce_yolo_tpu.api import YOLO

    m = YOLO("/root/reference/ultralytics/cfg/models/v10/yolov10n.yaml")
    img = np.full((80, 96, 3), 128, np.uint8)
    results = m.predict(img, imgsz=64, conf=0.0)
    assert len(results) == 1
    r = results[0]
    assert r.boxes.xyxy.shape[1] == 4
