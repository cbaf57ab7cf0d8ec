"""CLI matrix: every task x {train, val, predict} through the `yolo-tpu`
entrypoint grammar (VERDICT r2 next-step #4; reference tests/test_cli.py:29-47
runs `yolo TASK MODE` per task via subprocess — here the matrix runs
in-process for speed and one subprocess smoke test proves the console path).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from fce_yolo_tpu.cfg import entrypoint


@pytest.fixture()
def task_data(request, tiny_dataset, tiny_seg_dataset, tiny_pose_dataset,
              tiny_obb_dataset, tiny_cls_dataset):
    return {
        "detect": tiny_dataset,
        "segment": tiny_seg_dataset,
        "pose": tiny_pose_dataset,
        "obb": tiny_obb_dataset,
        "classify": tiny_cls_dataset,
    }


TASKS = ["detect", "segment", "pose", "obb", "classify"]


@pytest.mark.parametrize("task", TASKS)
def test_cli_train_val_predict(task, task_data, tmp_path, monkeypatch):
    data = task_data[task]
    monkeypatch.chdir(tmp_path)

    out = entrypoint([
        task, "train", f"data={data}", "epochs=1", "batch=4", "imgsz=64",
        "workers=0", "val=True", "verbose=False", f"project={tmp_path}/runs",
    ])
    assert out["epochs_run"] == 1
    best = Path(out["save_dir"]) / "weights" / "best"
    last = Path(out["save_dir"]) / "weights" / "last"
    ckpt = best if best.exists() else last
    assert ckpt.exists()

    res = entrypoint([
        task, "val", f"model={ckpt}", f"data={data}", "imgsz=64", "batch=4",
        "workers=0", "verbose=False",
    ])
    assert isinstance(res, dict) and res

    # predict on one image from the dataset
    if task == "classify":
        img_dir = next(p for p in sorted(Path(data).glob("val/*")) if p.is_dir())
    else:
        import yaml

        d = yaml.safe_load(open(data))
        img_dir = Path(d["path"]) / d["val"]
    src = sorted(img_dir.glob("*.jpg"))[0]
    results = entrypoint([
        task, "predict", f"model={ckpt}", f"source={src}", "imgsz=64",
        "conf=0.01", f"project={tmp_path}/runs", "save=True", "save_txt=True",
        "save_crop=True",
    ])
    assert len(results) == 1
    r = results[0]
    if task == "classify":
        assert r.probs is not None and 0 <= r.probs.top1 < 2
    else:
        assert r.boxes is not None
        out_dir = Path(f"{tmp_path}/runs") / "predict"
        assert (out_dir / f"{src.stem}.jpg").exists()
        assert (out_dir / "labels" / f"{src.stem}.txt").exists()
        if len(r.boxes):  # crops only when something was detected
            assert any((out_dir / "crops").rglob("*.jpg"))


@pytest.mark.slow
def test_cli_subprocess_smoke(tiny_dataset, tmp_path):
    """The console path (`python -m fce_yolo_tpu`) end to end."""
    proc = subprocess.run(
        [sys.executable, "-m", "fce_yolo_tpu", "detect", "train",
         f"data={tiny_dataset}", "epochs=1", "batch=4", "imgsz=64",
         "workers=0", "device=cpu", f"project={tmp_path}/runs", "verbose=False"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_cli_task_default_models():
    from fce_yolo_tpu.cfg import TASK2MODEL

    from fce_yolo_tpu.api import YOLO

    for task, model in TASK2MODEL.items():
        y = YOLO(model)
        assert y.task == task, f"{model} resolved to task {y.task}"


@pytest.mark.slow
def test_cli_solutions_count(tiny_dataset, tmp_path):
    """`yolo-tpu solutions count ...` runs a solution over an image-dir
    source (reference handle_yolo_solutions, cfg/__init__.py:638)."""
    import yaml

    d = yaml.safe_load(open(tiny_dataset))
    img_dir = Path(d["path"]) / d["val"]
    results = entrypoint([
        "solutions", "count", f"source={img_dir}", "model=yolo11n.yaml",
        "region=[(0,50),(640,50)]", "conf=0.01", f"save_dir={tmp_path}/frames",
    ])
    assert len(results) == 4  # one SolutionResults per val image
    assert all(hasattr(r, "in_count") for r in results)
    assert len(list((tmp_path / "frames").glob("*.jpg"))) == 4
    # help path lists names
    assert entrypoint(["solutions", "help"]) == []


@pytest.mark.slow
def test_cli_track_save(tiny_dataset, tmp_path):
    import yaml

    d = yaml.safe_load(open(tiny_dataset))
    img_dir = Path(d["path"]) / d["val"]
    out = entrypoint([
        "detect", "track", "model=yolo11n.yaml", f"source={img_dir}",
        "imgsz=64", "conf=0.01", "save=True", f"project={tmp_path}/runs",
    ])
    assert len(out) == 4
    frames = list((Path(f"{tmp_path}/runs") / "track").glob("*.jpg"))
    assert len(frames) == 4


def test_cli_special_commands(tmp_path, monkeypatch, capsys):
    """Special no-mode commands (reference entrypoint:853-870): version,
    checks, settings (print/update/reset), cfg, copy-cfg, plus the
    singular/dash spelling forgiveness."""
    import fce_yolo_tpu
    import fce_yolo_tpu.utils.settings as settings_mod

    # version (and dash alias)
    assert entrypoint(["version"]) == fce_yolo_tpu.__version__
    assert entrypoint(["--version"]) == fce_yolo_tpu.__version__

    # cfg prints the default yaml
    entrypoint(["cfg"])
    assert "iou_type" in capsys.readouterr().out

    # copy-cfg writes default_copy.yaml into cwd
    monkeypatch.chdir(tmp_path)
    entrypoint(["copy-cfg"])
    assert (tmp_path / "default_copy.yaml").exists()

    # settings: print, update, singular alias, reset — on an isolated file
    monkeypatch.setattr(settings_mod, "SETTINGS",
                        settings_mod.SettingsManager(tmp_path / "settings.json"))
    out = entrypoint(["settings", "runs_dir=elsewhere"])
    assert out["runs_dir"] == "elsewhere"
    assert entrypoint(["setting"])["runs_dir"] == "elsewhere"  # persisted
    assert entrypoint(["settings", "reset"])["runs_dir"] == "runs"

    # checks: never hangs, reports versions
    info = entrypoint(["checks"])
    assert info["jax"] not in (None, "not installed")

    # help via -h
    entrypoint(["-h"])
    assert "yolo-tpu TASK MODE" in capsys.readouterr().out


def test_cli_bare_bool_and_cfg_file(tiny_dataset, tmp_path):
    """Bare bool args auto-set True (`yolo predict ... save`) and
    cfg=custom.yaml overrides the defaults (reference entrypoint:873-900)."""
    import yaml

    d = yaml.safe_load(open(tiny_dataset))
    img = next((Path(d["path"]) / d["val"]).glob("*.jpg"))

    custom = tmp_path / "custom.yaml"
    custom.write_text("imgsz: 64\nconf: 0.9\n")
    results = entrypoint([
        "detect", "predict", "model=yolo11n.yaml", f"source={img}",
        f"cfg={custom}", "verbose", f"project={tmp_path}/runs", "save",
    ])
    assert len(results) == 1
    # save=True came from the bare flag; imgsz came from the cfg file
    assert list((Path(f"{tmp_path}/runs") / "predict").glob("*.jpg"))
