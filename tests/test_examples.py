"""Deploy examples: SAHI tiled inference merge geometry, TFLite-consumer
numpy postprocess, region-counter CLI parsing (examples/)."""

import sys
from pathlib import Path

import numpy as np
import pytest

EX = Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EX / "sahi_tiled_inference"))
sys.path.insert(0, str(EX / "tflite_python"))


class _StubModel:
    """Returns one fixed box per tile, in tile-local coords; lets the test
    assert the exact shift-back + merge behavior of tiled_predict."""

    names = {0: "thing"}

    def __init__(self, local_box=(10.0, 10.0, 50.0, 50.0, 0.9, 0)):
        self.local_box = np.asarray(local_box, np.float32)
        self.calls = []

    def predict(self, source, **kw):
        from fce_yolo_tpu.engine.results import Results

        srcs = source if isinstance(source, (list, tuple)) else [source]
        self.calls.append(len(srcs))
        return [
            Results(img, "t", self.names, boxes=self.local_box[None].copy())
            for img in srcs
        ]


def test_tiled_predict_shifts_and_merges():
    from tiled_predict import tiled_predict

    img = np.zeros((1000, 1600, 3), np.uint8)
    stub = _StubModel()
    res = tiled_predict(stub, img, tile=640, overlap=0.25, full_frame=False)
    # windows for 1000x1600 at tile 640 gap 160: starts are multiples of 480
    from fce_yolo_tpu.data.split_dota import get_windows

    wins = get_windows((1000, 1600), crop_sizes=(640,), gaps=(160,))
    assert stub.calls == [len(wins)]
    d = res.boxes.data
    # every kept box is the stub box shifted by some window origin
    origins = {(max(0, int(x1)), max(0, int(y1))) for x1, y1, _, _ in wins}
    for x1, y1, x2, y2, conf, cls in d:
        assert (round(x1 - 10), round(y1 - 10)) in origins
        assert round(x2 - x1) == 40 and round(y2 - y1) == 40
        assert conf == pytest.approx(0.9) and cls == 0
    # identical-score overlapping duplicates from adjacent windows got merged:
    # window grid is 3x2 but several boxes coincide after shifting only if
    # origins coincide — they don't — so all survive NMS (disjoint 40px boxes)
    assert len(d) == len(wins)


def test_tiled_predict_full_frame_dedup():
    """With full_frame=True the whole-image pass adds a box identical to the
    tile-0 box; class-aware NMS must merge the duplicate."""
    from tiled_predict import tiled_predict

    img = np.zeros((600, 600, 3), np.uint8)  # single 640-window -> 1 tile
    stub = _StubModel()
    res = tiled_predict(stub, img, tile=640, overlap=0.25, full_frame=True)
    assert len(res.boxes.data) == 1  # tile box + full-frame box deduped


def test_class_aware_nms_keeps_other_class():
    from tiled_predict import _class_aware_nms

    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    cls = np.array([0, 0, 1], np.float32)
    keep = _class_aware_nms(boxes, scores, cls, iou_thres=0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_tflite_example_decode_math():
    from main import decode, letterbox

    # 3 anchors, 2 classes; one passes conf, one suppressed dup, one low-conf
    p = np.zeros((1, 3, 6), np.float32)
    p[0, 0] = [50, 50, 20, 20, 0.9, 0.1]
    p[0, 1] = [51, 51, 20, 20, 0.8, 0.1]   # same class, overlaps anchor 0
    p[0, 2] = [200, 200, 10, 10, 0.1, 0.05]
    det = decode(p, conf_thres=0.25, iou_thres=0.5, max_det=10)
    assert det.shape == (1, 6)
    np.testing.assert_allclose(det[0, :4], [40, 40, 60, 60])
    assert det[0, 4] == pytest.approx(0.9) and det[0, 5] == 0

    img = np.zeros((100, 200, 3), np.uint8)
    out, r, (dw, dh) = letterbox(img, 640)
    assert out.shape == (640, 640, 3) and r == pytest.approx(3.2)
    assert dw == 0 and dh == (640 - 320) // 2


def test_region_counter_cli_parse():
    sys.path.insert(0, str(EX))
    from region_counter import parse_region

    name, pts = parse_region("name=door; 100,100 300,100 300,300")
    assert name == "door" and pts == [(100.0, 100.0), (300.0, 100.0), (300.0, 300.0)]
    name2, pts2 = parse_region("0,0 10,0 10,10")
    assert name2 == "region" and len(pts2) == 3
    with pytest.raises(AssertionError):
        parse_region("name=x; 0,0 1,1")


def test_action_crop_and_vote():
    """crop_track margin expansion + FrameVoteActionClassifier majority vote
    (examples/action_recognition.py, reference YOLOv8-Action-Recognition)."""
    sys.path.insert(0, str(EX))
    from action_recognition import FrameVoteActionClassifier, crop_track

    frame = np.zeros((100, 200, 3), np.uint8)
    crop = crop_track(frame, np.array([20.0, 30.0, 60.0, 70.0]), margin=0.25)
    # 40px box +25% margin each side -> 60px span, clipped to the frame
    assert crop.shape[:2] == (60, 60)
    edge = crop_track(frame, np.array([0.0, 0.0, 40.0, 40.0]), margin=0.5)
    assert edge.shape[:2] == (60, 60)  # clipped at the 0 edges

    class _Probs:
        def __init__(self, top1, conf):
            self.top1, self.top1conf = top1, conf

    class _R:
        names = {0: "walk", 1: "run"}

        def __init__(self, top1, conf):
            self.probs = _Probs(top1, conf)

    class _Stub:
        seq = [_R(0, 0.9), _R(1, 0.6), _R(0, 0.7)]

        def predict(self, crop, verbose=False):
            return [self.seq.pop(0)]

    clf = FrameVoteActionClassifier.__new__(FrameVoteActionClassifier)
    clf.model = _Stub()
    label, conf = clf(list(np.zeros((3, 8, 8, 3), np.uint8)))
    assert label == "walk" and abs(conf - 0.8) < 1e-6


def test_interactive_tracker_dashed_rect():
    """dashed_rect draws on all four edges but leaves gaps
    (examples/interactive_tracker.py, reference Interactive-Tracking-UI)."""
    sys.path.insert(0, str(EX))
    from interactive_tracker import dashed_rect

    im = np.zeros((80, 80, 3), np.uint8)
    dashed_rect(im, (10, 10), (70, 70), color=(255, 255, 255), thickness=1, dash=6)
    top = im[10, 10:70, 0]
    assert top.sum() > 0 and (top == 0).any()  # drawn, with gaps
    left = im[10:70, 10, 0]
    assert left.sum() > 0 and (left == 0).any()
