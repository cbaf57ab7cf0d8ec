"""Plotting + figures smoke tests (files produced, non-empty)."""

import numpy as np

from fce_yolo_tpu.utils.plotting import plot_confusion_matrix, plot_labels, plot_pr_curve, plot_results


def _fake_run(tmp_path, name, maps):
    run = tmp_path / name
    run.mkdir()
    lines = ["epoch,train/box_loss,metrics/mAP50(B),metrics/mAP50-95(B)"]
    for i, m in enumerate(maps):
        lines.append(f"{i},{3.0 - i * 0.1},{m + 0.1},{m}")
    (run / "results.csv").write_text("\n".join(lines) + "\n")
    return run


def test_plot_results(tmp_path):
    run = _fake_run(tmp_path, "r1", [0.1, 0.2, 0.3])
    out = plot_results(run)
    assert out and (run / "results.png").stat().st_size > 1000


def test_plot_pr_and_confusion(tmp_path):
    px = np.linspace(0, 1, 1000)
    py = np.clip(1 - px[None, :] ** 2, 0, 1).repeat(3, 0)
    ap = np.full((3, 10), 0.5)
    f1 = plot_pr_curve(px, py, ap, {0: "a", 1: "b", 2: "c"}, tmp_path / "pr.png")
    m = np.array([[5, 1, 0, 1], [0, 4, 0, 2], [1, 0, 6, 0], [2, 1, 1, 0]], float)
    f2 = plot_confusion_matrix(m, {0: "a", 1: "b", 2: "c"}, tmp_path / "cm.png")
    assert (tmp_path / "pr.png").stat().st_size > 1000
    assert (tmp_path / "cm.png").stat().st_size > 1000


def test_plot_labels(tmp_path):
    cls = np.random.randint(0, 3, 50)
    boxes = np.random.rand(50, 4) * 0.5
    plot_labels(cls, boxes, {0: "a", 1: "b", 2: "c"}, tmp_path / "labels.png")
    assert (tmp_path / "labels.png").stat().st_size > 1000


def test_figures(tmp_path):
    from fce_yolo_tpu.experiments.figures import produce_all

    runs = {
        "baseline": _fake_run(tmp_path, "baseline_yolo11m_stage2", [0.1, 0.3, 0.5]),
        "fce_wiou": _fake_run(tmp_path, "fce_wiou_m_stage2", [0.2, 0.4, 0.6]),
    }
    figs = produce_all(runs, tmp_path / "figs", scale="m")
    assert len(figs) == 4
    assert (tmp_path / "figs" / "training_curves.png").stat().st_size > 1000
    assert (tmp_path / "figs" / "ablation_bars.png").stat().st_size > 1000
