"""Experiment layer tests: config registry logic (reference script/test.py
analog) + a real micro two-stage + ablation run on the tiny dataset."""

import numpy as np
import pytest

from fce_yolo_tpu.experiments import (
    ABLATION_ORDER,
    MODEL_CONFIGS,
    StageConfig,
    TrainConfig,
    ablation_table,
    apply_overrides,
    best_epoch,
    format_table,
    get_dataset_preset,
    get_model_config,
    inspect_variables,
    load_results,
)


def test_registry_contents():
    assert list(MODEL_CONFIGS) == ABLATION_ORDER
    for name, mc in MODEL_CONFIGS.items():
        assert mc.is_two_stage()
        assert mc.stage1.epochs == 50 and mc.stage2.epochs == 250  # fork recipe
        assert mc.stage1.close_mosaic == 0 and mc.stage2.close_mosaic == 20
    assert MODEL_CONFIGS["fce_wiou"].iou_type == "WIoU"
    assert MODEL_CONFIGS["fce"].yaml_path == "yolo11-fce.yaml"


def test_result_paths():
    mc = get_model_config("baseline")
    assert mc.get_result_path("m") == "baseline_yolo11m_stage2"
    assert mc.get_result_path("m", stage=1) == "baseline_yolo11m_stage1"
    assert get_model_config("fce").get_result_path("s") == "fce_s_stage2"


def test_unknown_model_type():
    with pytest.raises(ValueError, match="unknown model type"):
        get_model_config("nope")


def test_apply_overrides():
    cfg = get_dataset_preset("coco")
    cfg.stage1 = StageConfig(epochs=50)
    out = apply_overrides(cfg, {"batch": 64, "lr0": 0.005, "epochs": 10, "custom_flag": 1, "imgsz": None})
    assert out.batch == 64
    assert out.stage1.lr0 == 0.005 and out.stage2.lr0 == 0.005
    assert out.stage1.epochs == 10 and out.stage2.epochs == 10
    assert out.extra_args["custom_flag"] == 1
    assert out.imgsz == 640  # None override ignored
    # presets are copies: mutating one must not leak into the registry
    assert get_dataset_preset("coco").batch == 16


def test_analysis_roundtrip(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    (run / "results.csv").write_text(
        "epoch,metrics/mAP50(B),metrics/mAP50-95(B)\n0,0.50,0.30\n1,0.70,0.45\n2,0.65,0.40\n"
    )
    rows = load_results(run)
    assert len(rows) == 3
    b = best_epoch(rows)
    assert b["epoch"] == 1
    run2 = tmp_path / "run2"
    run2.mkdir()
    (run2 / "results.csv").write_text(
        "epoch,metrics/mAP50(B),metrics/mAP50-95(B)\n0,0.75,0.50\n"
    )
    table = ablation_table({"baseline": run, "fce": run2})
    assert table[0]["mAP50-95"] == 45.0
    assert table[1]["delta_vs_baseline"] == 5.0
    txt = format_table(table)
    assert "baseline" in txt and "fce" in txt


def test_inspect_variables_fusion_weights():
    params = {
        "layers_12": {"w": np.array([2.0, 0.5, 0.1], np.float32)},
        "layers_5": {
            "out_h": {"kernel": np.ones((1, 1, 8, 8), np.float32)},
            "out_w": {"kernel": np.ones((1, 1, 8, 8), np.float32) * 0.1},
        },
    }
    rep = inspect_variables({"params": params})
    assert len(rep["bifpn"]) == 1
    info = list(rep["bifpn"].values())[0]
    assert info["verdict"].startswith("strong")
    assert abs(sum(info["normalized"]) - 1.0) < 0.01
    assert "layers_5" in rep["bicoord"]


@pytest.mark.slow
def test_two_stage_and_ablation_micro(tiny_dataset, tmp_path):
    """Micro end-to-end: two variants, 2-stage (3+5 epochs), real training."""
    from dataclasses import replace

    from fce_yolo_tpu.experiments import run_ablation

    cfg = TrainConfig(
        data=tiny_dataset, batch=4, imgsz=96, workers=2, project=str(tmp_path),
        optimizer="AdamW", max_labels=16,
        extra_args={"mosaic": 0.0, "warmup_epochs": 0.0, "scale": 0.2, "verbose": False},
    )
    # shrink the registry recipe for test speed
    import fce_yolo_tpu.experiments.config as C

    orig = dict(C.MODEL_CONFIGS)
    try:
        for k in ("baseline", "fce_wiou"):
            C.MODEL_CONFIGS[k] = replace(
                orig[k],
                stage1=StageConfig(epochs=3, patience=10, lr0=0.005, close_mosaic=0),
                stage2=StageConfig(epochs=5, patience=10, lr0=0.005, close_mosaic=0),
            )
        report = run_ablation(cfg, scale="n", models=["baseline", "fce_wiou"], verbose=False)
    finally:
        C.MODEL_CONFIGS.update(orig)

    assert len(report["table"]) == 2
    assert (tmp_path / "baseline_yolo11n_stage2" / "results.csv").exists()
    assert (tmp_path / "fce_wiou_n_stage2" / "results.csv").exists()
    # iou_type echo validation found no mismatches
    assert not [p for p in report["problems"] if "iou_type" in p], report["problems"]


def test_pack_results(tmp_path):
    import zipfile

    from fce_yolo_tpu.experiments.pack import pack_results

    for name, maps in (("baseline", [0.3, 0.4]), ("fce", [0.4, 0.5])):
        run = tmp_path / name
        (run / "weights" / "best").mkdir(parents=True)
        (run / "results.csv").write_text(
            "epoch,metrics/mAP50(B),metrics/mAP50-95(B)\n"
            + "\n".join(f"{i},{m + 0.1},{m}" for i, m in enumerate(maps)) + "\n"
        )
        (run / "weights" / "best" / "meta.json").write_text("{}")
    z = pack_results({"baseline": tmp_path / "baseline", "fce": tmp_path / "fce"},
                     tmp_path / "pack.zip")
    with zipfile.ZipFile(z) as zf:
        names = zf.namelist()
        assert "summary.json" in names
        assert "baseline/results.csv" in names and "fce/weights/best/meta.json" in names
        import json

        s = json.loads(zf.read("summary.json"))
        assert s["table"][1]["delta_vs_baseline"] == 10.0
