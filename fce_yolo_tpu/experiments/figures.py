"""Paper-figure generation (rebuild of script/paper_plots.py / paper_figs.py).

Comparison figures across ablation variants: overlaid training curves
(mAP50-95 vs epoch per variant, fork colors from the registry), the
incremental-ablation bar chart, and per-run PR/confusion figures via
utils/plotting.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from fce_yolo_tpu.experiments.analysis import MAP_KEY, best_epoch, load_results
from fce_yolo_tpu.experiments.config import MODEL_CONFIGS

__all__ = ["plot_training_curves", "plot_ablation_bars", "produce_all"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_training_curves(
    runs: dict[str, str | Path],
    save_path: str | Path = "training_curves.png",
    key: str = MAP_KEY,
    scale: str = "m",
) -> str:
    """Overlay each variant's val-mAP curve (reference paper_plots.produce_B:235)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, run_dir in runs.items():
        rows = load_results(run_dir)
        xs = [r["epoch"] for r in rows if isinstance(r.get(key), (int, float))]
        ys = [r[key] * 100 for r in rows if isinstance(r.get(key), (int, float))]
        mc = MODEL_CONFIGS.get(name)
        color = mc.color if mc else None
        label = mc.get_display_name(scale) if mc else name
        ax.plot(xs, ys, label=label, color=color, lw=1.5)
    ax.set_xlabel("Epoch")
    ax.set_ylabel("mAP@50-95 (%)")
    ax.legend(fontsize=9)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return str(save_path)


def plot_ablation_bars(
    table: list[dict],
    save_path: str | Path = "ablation_bars.png",
    scale: str = "m",
) -> str:
    """Bar chart of best mAP50-95 per variant with incremental deltas."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    names = [r["model"] for r in table]
    vals = [r["mAP50-95"] for r in table]
    colors = [MODEL_CONFIGS[n].color if n in MODEL_CONFIGS else "#888888" for n in names]
    labels = [
        MODEL_CONFIGS[n].get_display_name(scale) if n in MODEL_CONFIGS else n for n in names
    ]
    bars = ax.bar(range(len(names)), vals, color=colors)
    for i, (b, r) in enumerate(zip(bars, table)):
        delta = r.get("delta_vs_prev")
        txt = f"{r['mAP50-95']:.2f}" + (f"\n(+{delta:.2f})" if delta and delta > 0 else "")
        ax.text(b.get_x() + b.get_width() / 2, b.get_height() + 0.1, txt, ha="center", fontsize=8)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(labels, rotation=15, fontsize=8)
    ax.set_ylabel("best mAP@50-95 (%)")
    lo = min(vals) if vals else 0
    ax.set_ylim(max(lo - 5, 0), (max(vals) if vals else 1) + 3)
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return str(save_path)


def produce_all(runs: dict[str, str | Path], out_dir: str | Path, scale: str = "m") -> list[str]:
    """Generate the full figure set for an ablation (training curves + bars
    + per-run results grids)."""
    from fce_yolo_tpu.experiments.analysis import ablation_table
    from fce_yolo_tpu.utils.plotting import plot_results

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    figs = [
        plot_training_curves(runs, out_dir / "training_curves.png", scale=scale),
        plot_ablation_bars(ablation_table(runs), out_dir / "ablation_bars.png", scale=scale),
    ]
    for name, run in runs.items():
        f = plot_results(run)
        if f:
            figs.append(f)
    return figs
