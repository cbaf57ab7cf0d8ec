"""Config system + CLI grammar tests (reference tests/test_cli.py analog,
run in-process instead of via subprocess — same coverage, no spawn cost)."""

import pytest

from fce_yolo_tpu.cfg import check_cfg, entrypoint, get_cfg, load_default_cfg


def test_default_cfg_loads():
    d = load_default_cfg()
    assert d["task"] == "detect"
    assert d["iou_type"] == "CIoU"  # the fork's flag (reference default.yaml:102)
    assert d["box"] == 7.5 and d["cls"] == 0.5 and d["dfl"] == 1.5


def test_get_cfg_overrides_and_coercion():
    cfg = get_cfg({"epochs": "50", "lr0": "0.02", "cos_lr": "true", "iou_type": "WIoU"})
    assert cfg.epochs == 50 and isinstance(cfg.epochs, int)
    assert cfg.lr0 == 0.02
    assert cfg.cos_lr is True
    assert cfg.iou_type == "WIoU"


def test_get_cfg_unknown_key_suggestion():
    with pytest.raises(SyntaxError, match="did you mean"):
        get_cfg({"epoch": 3})


def test_get_cfg_type_errors():
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        get_cfg({"lr0": 5.0})
    with pytest.raises(TypeError, match="int"):
        get_cfg({"epochs": "abc"})


def test_entrypoint_help(capsys):
    entrypoint(["help"])
    assert "usage" in capsys.readouterr().out


def test_entrypoint_bad_arg():
    with pytest.raises(SyntaxError):
        entrypoint(["detect", "train", "bogus-token"])
    with pytest.raises(SyntaxError):
        entrypoint(["detect"])  # no mode


def test_entrypoint_val_and_predict(tiny_dataset, tmp_path):
    res = entrypoint(["detect", "val", "model=yolo11n.yaml", f"data={tiny_dataset}", "imgsz=96", "batch=4", "verbose=False", "device=cpu"])
    assert "fitness" in res
    import cv2
    import numpy as np

    img = tmp_path / "im.jpg"
    cv2.imwrite(str(img), np.zeros((64, 64, 3), np.uint8))
    results = entrypoint([
        "detect", "predict", "model=yolo11n.yaml", f"source={img}", "imgsz=96",
        f"project={tmp_path}", "name=p", "save=False",
    ])
    assert len(results) == 1


def test_cli_subprocess(tiny_dataset, tmp_path):
    """Reference-style subprocess CLI smoke (tests/test_cli.py analog)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "fce_yolo_tpu", "detect", "val",
         "model=yolo11n.yaml", f"data={tiny_dataset}", "imgsz=96", "batch=4", "verbose=False", "device=cpu"],
        capture_output=True, text=True, timeout=500,
        env={**__import__("os").environ, "JAX_PLATFORMS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
