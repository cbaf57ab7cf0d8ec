"""Integration callback sinks (reference utils/callbacks/{tensorboard,...}).

Available sinks are registered onto a CallbackList; each degrades to a no-op
when its backend is missing (the reference gates on SETTINGS + import).
- TensorBoardSink: scalar curves via tf.summary (tensorboard ships with the
  baked-in tensorflow).
- CSVSink: results.csv mirror (the facade writes its own; this is for
  external consumers of the callback contract).
- JSONLSink: machine-readable per-epoch metric stream (wandb/comet analog
  without a service, reference utils/callbacks/wb.py).
- MLflowFileSink: mlflow FILE-STORE on-disk layout with zero dependencies
  (reference utils/callbacks/mlflow.py); `mlflow ui` can open the output.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from fce_yolo_tpu.utils.callbacks import CallbackList

__all__ = [
    "TensorBoardSink", "CSVSink", "JSONLSink", "MLflowFileSink",
    "add_integration_callbacks",
]


class TensorBoardSink:
    """Logs per-epoch scalars to runs/<name>/tb (reference callbacks/tensorboard.py)."""

    def __init__(self, log_dir: str):
        self.log_dir = str(log_dir)
        self._writer = None

    def _w(self):
        if self._writer is None:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(self.log_dir)
        return self._writer

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import tensorflow as tf

        with self._w().as_default():
            for k, v in (metrics or {}).items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v, step=epoch)
            self._w().flush()

    def register(self, cbs: CallbackList):
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)


class CSVSink:
    def __init__(self, path: str):
        self.path = Path(path)
        self._keys: list[str] | None = None

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import csv

        metrics = {"epoch": epoch, **(metrics or {})}
        new = not self.path.exists()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(metrics.keys()))
            if new:
                w.writeheader()
            w.writerow({k: v for k, v in metrics.items()})

    def register(self, cbs: CallbackList):
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)


class JSONLSink:
    """One JSON object per epoch appended to metrics.jsonl — the machine-
    readable training log (covers the reference's wandb/comet "stream of
    scalar dicts" contract, utils/callbacks/wb.py, without any service)."""

    def __init__(self, path: str):
        self.path = Path(path)

    def on_pretrain_routine_end(self, trainer: Any = None, **kw):
        import json
        import time

        self.path.parent.mkdir(parents=True, exist_ok=True)
        cfg = getattr(trainer, "cfg", None)
        rec = {"event": "start", "time": time.time()}
        if cfg is not None:
            rec["config"] = {
                k: v for k, v in vars(cfg).items() if isinstance(v, (int, float, str, bool))
            }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import json

        self.path.parent.mkdir(parents=True, exist_ok=True)
        rec = {"epoch": epoch}
        for k, v in (metrics or {}).items():
            if isinstance(v, (int, float, str, bool)):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def register(self, cbs: CallbackList):
        cbs.add("on_pretrain_routine_end", self.on_pretrain_routine_end)
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)


class MLflowFileSink:
    """MLflow FILE-STORE writer (reference utils/callbacks/mlflow.py) with no
    mlflow dependency: emits the `mlruns/<exp_id>/<run_id>/` on-disk layout —
    meta.yaml, params/<k>, metrics/<k> ("<ts> <value> <step>" lines),
    tags/<k> — which a real `mlflow ui --backend-store-uri` can open."""

    def __init__(self, root: str, experiment: str = "fce-yolo-tpu", run_name: str = "train"):
        import time
        import uuid

        self.exp_dir = Path(root) / "0"
        self.run_id = uuid.uuid4().hex
        self.run_dir = self.exp_dir / self.run_id
        self._t0 = time.time()
        self.experiment, self.run_name = experiment, run_name

    def _write_meta(self):
        import time

        (self.exp_dir).mkdir(parents=True, exist_ok=True)
        if not (self.exp_dir / "meta.yaml").exists():
            (self.exp_dir / "meta.yaml").write_text(
                f"artifact_location: {self.exp_dir.as_uri()}\ncreation_time: {int(self._t0 * 1000)}\n"
                f"experiment_id: '0'\nlifecycle_stage: active\nname: {self.experiment}\n"
            )
        for sub in ("metrics", "params", "tags", "artifacts"):
            (self.run_dir / sub).mkdir(parents=True, exist_ok=True)
        (self.run_dir / "meta.yaml").write_text(
            f"artifact_uri: {(self.run_dir / 'artifacts').as_uri()}\nend_time: null\n"
            f"entry_point_name: ''\nexperiment_id: '0'\nlifecycle_stage: active\n"
            f"run_id: {self.run_id}\nrun_name: {self.run_name}\nrun_uuid: {self.run_id}\n"
            f"source_name: ''\nsource_type: 4\nsource_version: ''\n"
            f"start_time: {int(self._t0 * 1000)}\nstatus: 1\nuser_id: fce-yolo-tpu\n"
            + f"tags: []\n"
        )
        (self.run_dir / "tags" / "mlflow.runName").write_text(self.run_name)

    def on_pretrain_routine_end(self, trainer: Any = None, **kw):
        self._write_meta()
        cfg = getattr(trainer, "cfg", None)
        if cfg is not None:
            for k, v in vars(cfg).items():
                if isinstance(v, (int, float, str, bool)):
                    (self.run_dir / "params" / str(k)).write_text(str(v))

    def on_fit_epoch_end(self, trainer: Any = None, epoch: int = 0, metrics: dict | None = None, **kw):
        import time

        self._write_meta()
        ts = int(time.time() * 1000)
        for k, v in (metrics or {}).items():
            if isinstance(v, (int, float)):
                # mlflow file-store forbids '/' in metric filenames
                fname = str(k).replace("/", "_").replace("(", "").replace(")", "")
                with open(self.run_dir / "metrics" / fname, "a") as f:
                    f.write(f"{ts} {float(v)} {epoch}\n")

    def on_train_end(self, trainer: Any = None, **kw):
        import time

        meta = self.run_dir / "meta.yaml"
        if meta.exists():
            txt = meta.read_text().replace("end_time: null", f"end_time: {int(time.time() * 1000)}")
            meta.write_text(txt.replace("status: 1", "status: 3"))

    def register(self, cbs: CallbackList):
        cbs.add("on_pretrain_routine_end", self.on_pretrain_routine_end)
        cbs.add("on_fit_epoch_end", self.on_fit_epoch_end)
        cbs.add("on_train_end", self.on_train_end)


def add_integration_callbacks(
    cbs: CallbackList, save_dir: str, tensorboard: bool = True,
    jsonl: bool = True, mlflow: bool = False,
) -> CallbackList:
    """Attach available sinks (reference add_integration_callbacks, callbacks/base.py:193)."""
    if tensorboard:
        try:
            import tensorflow  # noqa: F401

            TensorBoardSink(str(Path(save_dir) / "tb")).register(cbs)
        except ImportError:
            pass
    if jsonl:
        JSONLSink(str(Path(save_dir) / "metrics.jsonl")).register(cbs)
    if mlflow:
        MLflowFileSink(str(Path(save_dir) / "mlruns")).register(cbs)
    return cbs
