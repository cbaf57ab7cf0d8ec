"""Experiment orchestration: the fork's script/ layer rebuilt
(config registry, two-stage trainer, ablation pipeline, analysis,
weight inspection; reference script/{config,trainer,run_ablation,
analysis,inspect_weights}.py)."""

from fce_yolo_tpu.experiments.ablation import detect_stale_runs, run_ablation, validate_run
from fce_yolo_tpu.experiments.analysis import ablation_table, best_epoch, format_table, load_results
from fce_yolo_tpu.experiments.config import (
    ABLATION_ORDER,
    DATASET_PRESETS,
    MODEL_CONFIGS,
    ModelConfig,
    StageConfig,
    TrainConfig,
    apply_overrides,
    get_dataset_preset,
    get_model_config,
)
from fce_yolo_tpu.experiments.inspect_weights import inspect_checkpoint, inspect_variables
from fce_yolo_tpu.experiments.trainer import ExperimentTrainer

__all__ = [
    "ABLATION_ORDER",
    "DATASET_PRESETS",
    "MODEL_CONFIGS",
    "ExperimentTrainer",
    "ModelConfig",
    "StageConfig",
    "TrainConfig",
    "ablation_table",
    "apply_overrides",
    "best_epoch",
    "detect_stale_runs",
    "format_table",
    "get_dataset_preset",
    "get_model_config",
    "inspect_checkpoint",
    "inspect_variables",
    "load_results",
    "run_ablation",
    "validate_run",
]
