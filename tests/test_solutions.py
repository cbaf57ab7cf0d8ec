"""Solutions: counter line-crossing logic + heatmap accumulation (unit-level,
driving process() directly with synthetic tracks — reference test_solutions
downloads demo videos; zero-egress here)."""

import numpy as np

from fce_yolo_tpu.engine.results import Results
from fce_yolo_tpu.solutions.counter import ObjectCounter
from fce_yolo_tpu.solutions.heatmap import Heatmap


class _Stub:
    """Bypass model construction: test the solution logic only."""

    def __new__(cls, target, **kw):
        obj = object.__new__(target)
        obj.names = {0: "a"}
        for k, v in kw.items():
            setattr(obj, k, v)
        return obj


def _result(h=100, w=100):
    return Results(np.zeros((h, w, 3), np.uint8), "f", {0: "a"})


def test_counter_in_out():
    c = _Stub(ObjectCounter, region=[(0, 50), (100, 50)])
    c.in_count = c.out_count = 0
    c.counted, c.prev_pos, c.classwise = set(), {}, {}

    # track 1 moves downward across y=50 (side>0 after), track 2 upward
    frames = [
        np.array([[10, 30, 20, 40, 1, 0.9, 0], [60, 60, 70, 70, 2, 0.9, 0]], float),
        np.array([[10, 55, 20, 65, 1, 0.9, 0], [60, 30, 70, 40, 2, 0.9, 0]], float),
    ]
    for tr in frames:
        img, info = c.process(_result(), tr)
    assert info["in"] == 1 and info["out"] == 1
    assert info["classwise"]["a"] == {"in": 1, "out": 1}
    # already-counted ids don't double count
    img, info = c.process(_result(), frames[0])
    assert info["in"] == 1 and info["out"] == 1


def test_heatmap_accumulates():
    hm = _Stub(Heatmap, decay=1.0, alpha=0.5)
    hm.acc = None
    tr = np.array([[10, 10, 30, 30, 1, 0.9, 0]], float)
    img, info = hm.process(_result(), tr)
    first = info["max_heat"]
    img, info = hm.process(_result(), tr)
    assert info["max_heat"] == first + 1.0
    assert img.shape == (100, 100, 3)


def test_speed_estimator():
    from collections import defaultdict, deque

    from fce_yolo_tpu.solutions.speed import SpeedEstimator

    s = _Stub(SpeedEstimator, mpp=0.1, fps=30.0)
    s.hist = defaultdict(lambda: deque(maxlen=5))
    s.speeds = {}
    # object moving 10 px/frame -> 10 * 0.1 m * 30 fps * 3.6 = 108 km/h
    for t in range(4):
        tr = np.array([[10 + 10 * t, 10, 30 + 10 * t, 30, 1, 0.9, 0]], float)
        img, info = s.process(_result(200, 200), tr)
    assert abs(info["speeds"][1] - 108.0) < 1.0


def test_region_counter():
    from fce_yolo_tpu.solutions.region_counter import RegionCounter, _point_in_poly

    poly = np.array([[0, 0], [50, 0], [50, 50], [0, 50]], float)
    assert _point_in_poly(np.array([25.0, 25.0]), poly)
    assert not _point_in_poly(np.array([75.0, 25.0]), poly)

    rc = _Stub(RegionCounter)
    rc.regions = {"zoneA": poly}
    tr = np.array([[10, 10, 30, 30, 1, 0.9, 0], [60, 60, 80, 80, 2, 0.9, 0]], float)
    img, info = rc.process(_result(), tr)
    assert info["counts"]["zoneA"] == 1
