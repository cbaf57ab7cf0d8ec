"""`YOLO` user facade: load / train / val / predict / track / save.

Mirrors the reference's engine/model.py Model API (train:711, val:580,
predict:477, task_map:1061) on the functional JAX core, dispatching every
task (detect / segment / pose / obb / classify, plus rtdetr / world / v10
graphs) to its trainer, validator and predictor: the facade owns the
(model, variables) pair and wires the data pipeline, jitted train step,
validator and checkpoints together.

Model sources accepted:
- "yolo11n.yaml" / "yolo11s-fce.yaml"... -> built from the packaged cfg
  (scale letter parsed from the stem, reference nn/tasks.py:1769).
- a checkpoint directory produced by .save()/.train() -> weights + meta.
- a torch .pt file -> imported via nn/import_torch (reference-weight interop).
- an exported artifact (.tflite / SavedModel dir / .stablehlo / .fyir) ->
  predict/val through nn/autobackend (reference nn/autobackend.py:71).
"""

from __future__ import annotations

import csv
import math
import time
from pathlib import Path
from typing import Any

import numpy as np

from fce_yolo_tpu.nn.model import build_model, init_variables, param_count
from fce_yolo_tpu.nn.parser import guess_scale
from fce_yolo_tpu.utils.checkpoint import is_checkpoint, load_checkpoint, save_checkpoint

__all__ = ["YOLO"]

CFG_DIR = Path(__file__).parent / "cfg" / "models"


def _git_describe() -> dict:
    """Repo provenance for checkpoints (reference saves git info in ckpts)."""
    import subprocess

    try:
        root = Path(__file__).resolve().parent.parent
        sha = subprocess.run(
            ["git", "-C", str(root), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "-C", str(root), "status", "--porcelain"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip())
        return {"commit": sha or None, "dirty": dirty}
    except Exception:
        return {"commit": None, "dirty": None}


def _resolve_yaml(name: str) -> tuple[str, str | None]:
    """'yolo11n-fce.yaml' -> (packaged yolo11-fce.yaml path, 'n')."""
    p = Path(name)
    if p.exists():
        return str(p), guess_scale(p.stem)
    import re

    stem = p.stem
    scale = guess_scale(stem)
    # strip the scale letter after the version digits: yolo11n-fce -> yolo11-fce,
    # yolov8s -> yolov8 (same regex as nn/parser.load_model_yaml)
    m = re.fullmatch(r"(yolov?\d+)([nslmx])(-[\w-]+)?", stem)
    if m:
        stem = m.group(1) + (m.group(3) or "")
    cand = CFG_DIR / f"{stem}.yaml"
    if cand.exists():
        return str(cand), scale
    raise FileNotFoundError(f"model yaml not found: {name} (looked in {CFG_DIR})")


class YOLO:
    """Detection model facade over the functional core."""

    def __init__(self, model: str = "yolo11n.yaml", nc: int | None = None, names: dict | None = None):
        import jax

        self.ckpt_meta: dict[str, Any] = {}
        self.names: dict[int, str] = names or {}
        self.backend = None  # AutoBackend when constructed from an export
        self.remote = None  # RemoteModel when constructed from a tcp:// URL
        if isinstance(model, str) and model.startswith("tcp://"):
            # remote serving endpoint (reference TritonRemoteModel routing,
            # utils/triton.py:11 / nn/autobackend.py triton branch): the
            # server owns the whole pipeline, predict just ships frames
            from fce_yolo_tpu.utils.remote import RemoteModel

            self.remote = RemoteModel(model)
            self.model, self.spec, self.strides = None, None, (8, 16, 32)
            self.variables = {}
            self.cfg_yaml, self.scale = model, None
            if not self.names:
                self.names = {i: f"class_{i}" for i in range(80)}
            self._rng = jax.random.PRNGKey(0)
            return
        from fce_yolo_tpu.nn.autobackend import is_exported_artifact

        if isinstance(model, str) and is_exported_artifact(model):
            # exported artifact (.tflite / SavedModel / .stablehlo / .fyir):
            # predict/val route through AutoBackend (reference autobackend.py:71)
            from fce_yolo_tpu.nn.autobackend import AutoBackend

            self.backend = AutoBackend(model)
            self.names = self.names or self.backend.names
            self.model, self.spec, self.strides = None, None, tuple(self.backend.strides)
            self.variables = {}
            self.cfg_yaml, self.scale = model, None
            self._rng = jax.random.PRNGKey(0)
            return
        if isinstance(model, str) and is_checkpoint(model):
            tree, meta = load_checkpoint(model)
            over = meta.get("yaml_overrides") or {}
            if over:  # train-time model-yaml overrides (e.g. data kpt_shape)
                import yaml as _yaml

                ydict = _yaml.safe_load(open(meta["cfg_yaml"]))
                ydict.update(over)
                ydict["nc"] = meta.get("nc", ydict.get("nc"))
                self.model, self.spec, self.strides = build_model(ydict, scale=meta.get("scale"))
            else:
                self.model, self.spec, self.strides = build_model(
                    meta["cfg_yaml"], scale=meta.get("scale"), nc=meta.get("nc")
                )
            self.yaml_overrides = over
            self.variables = {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
            self.names = {int(k): v for k, v in meta.get("names", {}).items()}
            self.ckpt_meta = meta
            self.cfg_yaml, self.scale = meta["cfg_yaml"], meta.get("scale")
        elif isinstance(model, str) and model.endswith(".pt"):
            from fce_yolo_tpu.nn.import_torch import import_torch_checkpoint, load_pt_state_dict

            # derive architecture from the filename (e.g. yolo11n.pt)
            yaml_path, scale = _resolve_yaml(model.rsplit("/", 1)[-1].replace(".pt", ".yaml"))
            self.model, self.spec, self.strides = build_model(yaml_path, scale=scale, nc=nc)
            self.variables = import_torch_checkpoint(load_pt_state_dict(model), self.model)
            self.cfg_yaml, self.scale = yaml_path, scale
        else:
            yaml_path, scale = _resolve_yaml(model)
            self.model, self.spec, self.strides = build_model(yaml_path, scale=scale, nc=nc)
            self.variables = None  # lazy init (first predict/train)
            self.cfg_yaml, self.scale = yaml_path, scale
        if not self.names:
            self.names = {i: f"class_{i}" for i in range(self.spec.nc)}
        self._rng = jax.random.PRNGKey(0)

    # ------------------------------------------------------------- helpers
    def load(self, weights: str) -> "YOLO":
        """Load weights from a checkpoint dir or a torch .pt into THIS
        architecture (reference Model.load, engine/model.py:356)."""
        if is_checkpoint(weights):
            tree, meta = load_checkpoint(weights)
            self.variables = {"params": tree["params"],
                              "batch_stats": tree.get("batch_stats", {})}
            if meta.get("names"):
                self.names = {int(k): v for k, v in meta["names"].items()}
        elif weights.endswith(".pt"):
            from fce_yolo_tpu.nn.import_torch import (
                import_torch_checkpoint,
                load_pt_state_dict,
            )

            self.variables = import_torch_checkpoint(
                load_pt_state_dict(weights), self.model
            )
        else:
            raise ValueError(f"cannot load weights from {weights!r}")
        return self

    def fuse(self) -> "YOLO":
        """Fold Conv+BN into conv weights (reference Model.fuse).

        The streaming predictor already folds lazily on first predict
        (engine/predictor.py _maybe_fold; measured l 1.163x, EVIDENCE r5);
        calling fuse() does it eagerly on the facade's variables so
        subsequent saves/exports carry fused weights. Idempotent."""
        if self.variables and "params" in self.variables:
            import jax.tree_util as tu

            already = not any(
                "'bn'" in str(p)
                for p, _ in tu.tree_leaves_with_path(self.variables["params"]))
            if not already:
                from fce_yolo_tpu.nn.model import fold_conv_bn

                self.variables = fold_conv_bn(self.variables)
        return self

    def reset_weights(self, seed: int = 0) -> "YOLO":
        """Re-initialize all parameters (reference Model.reset_weights)."""
        import jax

        from fce_yolo_tpu.nn.model import init_variables

        self._rng = jax.random.PRNGKey(seed)
        self.variables = init_variables(self.model, self._rng)
        return self

    @property
    def device(self) -> str:
        """Platform of the first jax device (reference Model.device)."""
        import jax

        return jax.devices()[0].platform

    @property
    def nc(self) -> int:
        return self.spec.nc

    def _ensure_variables(self, imgsz: int = 640):
        if self.variables is None:
            import jax

            with jax.default_device(jax.local_devices()[0]):
                self.variables = jax.jit(
                    lambda k: init_variables(self.model, k, imgsz=64)
                )(self._rng)
        return self.variables

    def info(self, flops: bool = False, imgsz: int = 640) -> dict:
        """Model summary (reference model_info, utils/torch_utils.py:303).

        Args:
            flops: also report GFLOPs at ``imgsz`` via XLA cost analysis
                (compiles the model once; seconds, not milliseconds).
        """
        v = self._ensure_variables()
        out = {"params": param_count(v), "nc": self.nc, "strides": self.strides, "yaml": self.cfg_yaml}
        if flops:
            from fce_yolo_tpu.nn.model import estimate_flops

            out["gflops"] = estimate_flops(self.model, imgsz=imgsz) / 1e9
        return out

    def save(self, path: str, extra_meta: dict | None = None) -> str:
        v = self._ensure_variables()
        meta = {
            "cfg_yaml": self.cfg_yaml,
            "scale": self.scale,
            "nc": self.nc,
            "names": self.names,
            **({"yaml_overrides": self.yaml_overrides} if getattr(self, "yaml_overrides", None) else {}),
            **(extra_meta or {}),
        }
        return save_checkpoint(path, {"params": v["params"], "batch_stats": v.get("batch_stats", {})}, meta)

    # ------------------------------------------------------------- predict
    @property
    def task(self) -> str:
        if self.remote is not None:  # the serving endpoint is detect-only
            return "detect"
        if self.spec is None:  # exported artifact: detect-graph exports only
            return self.backend.meta.get("task", "detect")
        return self.spec.task

    def predict(self, source, conf: float = 0.25, iou: float = 0.7, imgsz: int = 640,
                max_det: int = 300, batch: int = 1, stream: bool = False,
                classes: list[int] | None = None, verbose: bool = False):
        """``classes`` keeps only those class ids (reference predictor arg;
        NMS here is class-offset so a post-filter selects the same surviving
        boxes); ``verbose`` logs the reference's per-image summary line."""
        if self.remote is not None:
            gen = self._predict_remote(source)
            gen = self._postfilter(gen, classes, verbose)
            return gen if stream else list(gen)
        if self.task == "classify":
            gen = self._predict_classify(source, imgsz=imgsz if imgsz != 640 else 224)
            gen = self._postfilter(gen, None, verbose)
            return gen if stream else list(gen)
        from fce_yolo_tpu.engine.predictor import DetectionPredictor

        if self.backend is not None:
            imgsz = self.backend.imgsz
        predictor = DetectionPredictor(
            self.model, self.names, imgsz=imgsz, conf=conf, iou=iou, max_det=max_det,
            batch_size=batch, task=self.task, infer_fn=self.backend,
        )
        v = self._ensure_variables(imgsz) if self.backend is None else {}
        gen = self._postfilter(predictor.stream(v, source), classes, verbose)
        return gen if stream else list(gen)

    def _postfilter(self, gen, classes, verbose: bool):
        """Apply the ``classes`` row filter and ``verbose`` per-image log line
        (reference predictor verbose string, engine/predictor.py:333)."""
        from fce_yolo_tpu.utils.logger import LOGGER

        for i, r in enumerate(gen):
            if classes is not None and r.boxes is not None:
                r = r[np.isin(r.boxes.cls.astype(int), np.asarray(classes, int))]
            if verbose:
                LOGGER.info(f"image {i + 1} {r.path}: {r.verbose()}"
                            f" {r.speed['inference']:.1f}ms")
            yield r

    def _predict_remote(self, source):
        """Remote predict: ship each frame to the serving endpoint, wrap the
        returned rows (already in frame coordinates) as Results."""
        from fce_yolo_tpu.engine.predictor import load_source
        from fce_yolo_tpu.engine.results import Results

        for img, path in load_source(source):
            t0 = time.perf_counter()
            rows = self.remote(img)
            dt = (time.perf_counter() - t0) * 1000.0
            yield Results(orig_img=img, path=path, names=self.names, boxes=rows,
                          speed={"preprocess": 0.0, "inference": dt, "postprocess": 0.0})

    def _predict_classify(self, source, imgsz: int = 224):
        """Classification predict: val-transform -> softmax -> Results.probs
        (reference ClassificationPredictor, models/yolo/classify/predict.py)."""
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.data.classify import val_transform
        from fce_yolo_tpu.engine.predictor import load_source
        from fce_yolo_tpu.engine.results import Results

        v = self._ensure_variables(imgsz)
        fwd = jax.jit(lambda var, x: self.model.apply(var, x, train=False)["probs"])
        for img, path in load_source(source):
            x = val_transform(img, imgsz)[..., ::-1]  # BGR -> RGB
            probs = fwd(v, jnp.asarray(x[None].astype(np.float32) / 255.0))
            yield Results(img, path=path, names=self.names, probs=np.asarray(probs)[0])

    def __call__(self, source, **kw):
        return self.predict(source, **kw)

    # ---------------------------------------------------------------- export
    def export(self, format: str = "tflite", imgsz: int = 640, **kw) -> str:
        """Export to a deployable artifact; returns its path (reference
        Model.export, engine/model.py:684). Formats:
        stablehlo | saved_model | tflite (+int8=True) | native (.fyir)."""
        from fce_yolo_tpu.engine.exporter import export_model

        return export_model(self, fmt=format, imgsz=imgsz, **kw)

    def benchmark(self, data: str | None = None, imgsz: int = 640, **kw) -> list[dict]:
        """Export every format, then time + val each (reference
        Model.benchmark -> utils/benchmarks.py:54). Returns one row dict per
        format."""
        from fce_yolo_tpu.utils.benchmarks import benchmark as _benchmark

        return _benchmark(self, data=data, imgsz=imgsz, **kw)

    def tune(self, data: str, space: dict | None = None, iterations: int = 10,
             use_ray: bool = False, **train_kw) -> dict:
        """Evolutionary hyperparameter search over short trainings
        (reference Model.tune -> engine/tuner.py; use_ray=True routes to the
        Ray Tune bridge exactly like engine/model.py:662)."""
        from fce_yolo_tpu.engine.tuner import DEFAULT_SPACE, Tuner

        if use_ray:
            from fce_yolo_tpu.engine.tuner import run_ray_tune

            return run_ray_tune(self, space=space, max_samples=iterations,
                                data=data, **train_kw)
        base = {"model": self.cfg_yaml, "data": data, **train_kw}
        t = Tuner(space=space or DEFAULT_SPACE, base_args=base)
        return t(iterations=iterations)

    def embed(self, source, imgsz: int = 640) -> list[np.ndarray]:
        """One pooled deep-feature vector per image (reference Model.embed,
        engine/model.py:475: embeddings from the last model layer). Here the
        deepest detect-head input feature map is global-average-pooled."""
        import cv2
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.data.augment import letterbox
        from fce_yolo_tpu.engine.predictor import load_source

        v = self._ensure_variables(imgsz)
        fwd = jax.jit(
            lambda var, x: self.model.apply(var, x, train=False)["feats"][-1].mean((1, 2))
        )
        out = []
        for img, _ in load_source(source):
            lb, _, _ = letterbox(img, imgsz)
            x = jnp.asarray(lb[..., ::-1].copy(), jnp.float32)[None] / 255.0
            out.append(np.asarray(fwd(v, x))[0])
        return out

    # ----------------------------------------------------------------- track
    def track(self, source, tracker: str = "bytetrack.yaml", stream: bool = False, **predict_kw):
        """Detection + multi-object tracking over a (video) source.

        Yields/returns (Results, tracks (M, 7) [x1,y1,x2,y2,id,conf,cls]) per
        frame (reference Model.track, engine/model.py:537).
        """
        from fce_yolo_tpu.trackers.track import track_stream

        gen = track_stream(self, source, tracker=tracker, **predict_kw)
        return gen if stream else list(gen)

    # ----------------------------------------------------------------- val
    def val(self, data: str, imgsz: int = 640, batch: int = 16, conf: float = 0.001,
            iou: float = 0.7, max_det: int = 300, workers: int = 8, verbose: bool = True,
            plots_dir: str | None = None) -> dict:
        if self.task == "classify":
            return self._val_classify(data, imgsz=imgsz if imgsz != 640 else 224, batch=batch,
                                      verbose=verbose)
        from fce_yolo_tpu.data import check_det_dataset
        from fce_yolo_tpu.engine.validator import DetectionValidator

        d = check_det_dataset(data)
        if not self.names or all(v.startswith("class_") for v in self.names.values()):
            self.names = d["names"]
        if self.backend is not None:
            imgsz = self.backend.imgsz
            validator = DetectionValidator(
                None, self.names, imgsz=imgsz, conf=conf, iou=iou, max_det=max_det,
                batch_size=batch, workers=workers, infer_fn=self.backend,
            )
            return validator({}, data=data, verbose=verbose, plots_dir=plots_dir)
        validator = self._make_validator(
            imgsz=imgsz, conf=conf, iou=iou, max_det=max_det, batch_size=batch, workers=workers
        )
        return validator(self._ensure_variables(imgsz), data=data, verbose=verbose,
                         plots_dir=plots_dir)

    def _val_classify(self, data: str, imgsz: int = 224, batch: int = 16,
                      verbose: bool = True) -> dict:
        """Standalone classification val: top-1/top-5 on the val/test split
        (reference ClassificationValidator, models/yolo/classify/val.py)."""
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.data.classify import ClassificationDataset, classify_collate

        root = Path(data)
        split = next((root / s for s in ("val", "test") if (root / s).is_dir()), root)
        ds = ClassificationDataset(str(split), imgsz=imgsz, mode="val")
        if not self.names or all(v.startswith("class_") for v in self.names.values()):
            self.names = dict(ds.names)
        v = self._ensure_variables(imgsz)

        @jax.jit
        def eval_batch(var, x, y):
            probs = self.model.apply(var, x, train=False)["probs"]
            top5 = jnp.argsort(-probs, axis=-1)[:, :5]
            t1 = (top5[:, 0] == y).astype(jnp.float32)
            t5 = (top5 == y[:, None]).any(-1).astype(jnp.float32)
            return t1, t5

        t1s, t5s = [], []
        for i in range(0, len(ds), batch):
            items = [ds[j] for j in range(i, min(i + batch, len(ds)))]
            n_real = len(items)
            while len(items) < batch:
                items.append(items[-1])
            b = classify_collate(items)
            t1, t5 = eval_batch(v, jnp.asarray(b["img"].astype(np.float32) / 255.0),
                                jnp.asarray(b["label"]))
            t1s.extend(np.asarray(t1)[:n_real].tolist())
            t5s.extend(np.asarray(t5)[:n_real].tolist())
        res = {
            "metrics/accuracy_top1": float(np.mean(t1s)) if t1s else 0.0,
            "metrics/accuracy_top5": float(np.mean(t5s)) if t5s else 0.0,
        }
        if verbose:
            print(f"top1 {res['metrics/accuracy_top1']:.3f}  "
                  f"top5 {res['metrics/accuracy_top5']:.3f}  ({len(t1s)} images)")
        return res

    def _make_validator(self, **vkw):
        """Task-dispatched validator (reference task_map, engine/model.py:1061)."""
        from fce_yolo_tpu.engine.validator import DetectionValidator

        if self.task == "segment":
            from fce_yolo_tpu.engine.seg_validator import SegmentationValidator

            return SegmentationValidator(self.model, self.names, **vkw)
        if self.task == "pose":
            from fce_yolo_tpu.engine.task_validators import PoseValidator

            return PoseValidator(
                self.model, self.names,
                kpt_shape=tuple(self.spec.yaml_dict.get("kpt_shape", (17, 3))), **vkw,
            )
        if self.task == "obb":
            from fce_yolo_tpu.engine.task_validators import OBBValidator

            return OBBValidator(self.model, self.names, **vkw)
        if self.task == "rtdetr":
            from fce_yolo_tpu.engine.validator import RTDETRValidator

            return RTDETRValidator(self.model, self.names, **vkw)
        return DetectionValidator(self.model, self.names, **vkw)

    # --------------------------------------------------------------- train
    def train(
        self,
        data: str,
        epochs: int = 100,
        batch: int = 16,
        imgsz: int = 640,
        optimizer: str = "auto",
        lr0: float | None = None,
        lrf: float = 0.01,
        cos_lr: bool = False,
        iou_type: str = "CIoU",
        close_mosaic: int = 10,
        patience: int = 100,
        workers: int = 8,
        max_labels: int = 128,
        project: str = "runs/detect",
        name: str = "train",
        val: bool = True,
        save_period: int = -1,
        seed: int = 0,
        device_mesh=None,
        verbose: bool = True,
        freeze: int | list[int] | None = None,
        resume: bool = False,
        exist_ok: bool = False,
        time_limit_hours: float | None = None,
        callbacks=None,
        tensorboard: bool = False,
        bf16: bool | None = None,
        remat: bool | str = False,
        dataset_cls=None,
        dataset_kw: dict | None = None,
        **hyp_overrides,
    ) -> dict:
        """Full training run: per-epoch val on EMA weights, results.csv,
        last/best checkpoints, early stop, mosaic-close.

        Reproduces the reference BaseTrainer._do_train contract
        (engine/trainer.py:384-516) in a host loop around one jitted step.
        """
        if self.task == "classify":
            return self._train_classify(
                data=data, epochs=epochs, batch=batch, imgsz=imgsz, optimizer=optimizer,
                lr0=lr0, lrf=lrf, cos_lr=cos_lr, patience=patience, workers=workers,
                project=project, name=name, val=val, seed=seed, verbose=verbose,
                exist_ok=exist_ok or resume, **hyp_overrides,
            )

        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.data import AugmentCfg, DataLoader, YOLODataset, check_det_dataset
        from fce_yolo_tpu.engine.validator import DetectionValidator
        from fce_yolo_tpu.train.loss import DetectionLossCfg
        from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
        from fce_yolo_tpu.train.trainer import EarlyStopping, TrainState, create_train_state, make_train_step

        d = check_det_dataset(data)
        self.names = d["names"]
        # dataset-driven model-yaml overrides (reference PoseTrainer sets the
        # head kpt_shape from the DATA yaml, models/yolo/pose/train.py)
        yaml_over: dict = {}
        if self.task == "pose" and d.get("kpt_shape") and tuple(d["kpt_shape"]) != tuple(
            self.spec.yaml_dict.get("kpt_shape", (17, 3))
        ):
            yaml_over["kpt_shape"] = [int(x) for x in d["kpt_shape"]]
        if d["nc"] != self.nc or yaml_over:
            self.model, self.spec, self.strides = build_model(
                {**self.spec.yaml_dict, "nc": d["nc"], **yaml_over}, scale=self.scale
            )
            self.variables = None
            self.yaml_overrides = {**getattr(self, "yaml_overrides", {}), **yaml_over}

        aug_kw = {k: v for k, v in hyp_overrides.items() if k in AugmentCfg.__dataclass_fields__}
        hyp = AugmentCfg(**aug_kw)
        kpt_shape = tuple(self.spec.yaml_dict.get("kpt_shape", (17, 3)))
        if dataset_cls is not None:
            # custom dataset (e.g. YOLOMultiModalDataset/GroundingDataset):
            # the Python loader path; extra batch keys (txt_feats) flow
            # through collate into the train step
            train_ds = dataset_cls(
                d["train"], imgsz=imgsz, mode="train", hyp=hyp, seed=seed,
                **(dataset_kw or {}),
            )
        else:
            train_ds = YOLODataset(
                d["train"], imgsz=imgsz, mode="train", hyp=hyp, nc=d["nc"], seed=seed,
                task=self.task, kpt_shape=kpt_shape, flip_idx=d.get("flip_idx"),
            )
        use_native = hyp_overrides.get("native_loader")
        if dataset_cls is not None:
            use_native = False
        if use_native is None:  # prefer the C++ engine when built (detect-only path)
            from fce_yolo_tpu.data import native_loader as _nl

            use_native = (
                _nl.available() and self.task == "detect"
                and hyp.perspective == 0 and hyp.mixup == 0 and hyp.cutmix == 0
            )
        if use_native:
            from fce_yolo_tpu.data.native_loader import NativeDataLoader

            loader = NativeDataLoader(train_ds, batch_size=batch, workers=workers, max_labels=max_labels, seed=seed)
        else:
            loader = DataLoader(train_ds, batch_size=batch, workers=workers, max_labels=max_labels, seed=seed)
        steps_per_epoch = len(loader)

        # run-dir incrementing (reference get_save_dir/increment_path):
        # train -> train2 -> ...; resume/exist_ok reuse the dir as-is
        from fce_yolo_tpu.utils.files import increment_path

        save_dir = increment_path(Path(project) / name,
                                  exist_ok=resume or exist_ok, mkdir=True)

        from fce_yolo_tpu.utils.callbacks import CallbackList
        from fce_yolo_tpu.utils.integrations import add_integration_callbacks

        cbs = callbacks or CallbackList()
        if tensorboard:
            add_integration_callbacks(cbs, str(save_dir), tensorboard=True)

        v = self._ensure_variables(imgsz)
        optim_kw = {
            k: v
            for k, v in hyp_overrides.items()
            if k in ("momentum", "weight_decay", "warmup_epochs", "warmup_momentum", "warmup_bias_lr", "nbs")
        }
        optim_cfg = OptimCfg(
            optimizer=optimizer,
            lr0=lr0 if lr0 is not None else 0.01,
            lrf=lrf,
            cos_lr=cos_lr,
            batch_size=batch,
            epochs=epochs,
            steps_per_epoch=max(steps_per_epoch, 1),
            nc=d["nc"],
            state_bf16=bool(hyp_overrides.get("state_bf16")),
            **optim_kw,
        )
        if lr0 is not None and optimizer == "auto":
            optim_cfg = optim_cfg._replace(optimizer="AdamW" if epochs * steps_per_epoch <= 10000 else "SGD")
        # multimodal datasets score against their sampled text list, so the
        # class-logit count is the static text slot count, not the data nc
        loss_nc = getattr(train_ds, "max_samples", None) or d["nc"]
        loss_cfg = DetectionLossCfg(nc=loss_nc, strides=tuple(self.strides), iou_type=iou_type)
        # true gradient accumulation to the nominal batch with the
        # reference's warmup accumulate RAMP (trainer.py:342-344,405-437:
        # updates every batch early, every nbs/batch after warmup) — the
        # fire pattern + ni-exact LR positions are precomputed static arrays
        from fce_yolo_tpu.train.optim import accumulate_steps, boundary_schedule

        accumulate = accumulate_steps(optim_cfg)
        bounds = ni_map = None
        if accumulate > 1:
            bounds, ni_map = boundary_schedule(optim_cfg)
        tx = build_optimizer(optim_cfg, v["params"], freeze=freeze, ni_map=ni_map)
        # reduced-precision averaged weights (bf16_ema=True): a memory-
        # footprint option for very large models; see EMA docstring caveats
        ema_dtype = jnp.bfloat16 if hyp_overrides.get("bf16_ema") else None
        state = create_train_state(self.model, v, tx, accumulate=accumulate,
                                   ema_dtype=ema_dtype)
        task_loss = None
        batch_hook = None  # optional host-side per-batch augmentation (rtdetr cdn)
        batch_keys = ["img", "cls", "bboxes", "mask"]
        if self.task == "segment":
            from fce_yolo_tpu.train.task_losses import segmentation_loss

            task_loss = segmentation_loss
            batch_keys.append("masks")
        elif self.task == "obb":
            from fce_yolo_tpu.train.task_losses import obb_loss

            task_loss = obb_loss
        elif self.task == "pose":
            from fce_yolo_tpu.train.task_losses import PoseLossCfg, pose_loss

            pose_cfg = PoseLossCfg(det=loss_cfg, kpt_shape=kpt_shape)
            task_loss = lambda out, batch, cfg, state: pose_loss(out, batch, pose_cfg, state)
            batch_keys.append("keypoints")
        elif self.spec.layers[-1].name == "v10Detect":
            from fce_yolo_tpu.train.task_losses import e2e_detect_loss

            task_loss = e2e_detect_loss
        elif self.task == "rtdetr":
            from fce_yolo_tpu.train.detr_loss import DETRLossCfg, detr_loss, make_cdn_group

            detr_cfg = DETRLossCfg(nc=d["nc"])
            task_loss = lambda out, batch, cfg, state: detr_loss(out, batch, detr_cfg, state)
            # contrastive-denoising groups, built host-side per batch
            # (reference RTDETRDetectionModel.loss -> get_cdn_group); the
            # decoder clamps nq to the token count on tiny inputs (heads.py)
            ls_head = self.spec.layers[-1]
            nq_eff = min(ls_head.args[3] if len(ls_head.args) > 3 else 300,
                         sum((imgsz // s) ** 2 for s in (8, 16, 32)))
            _cdn_seed = [0]

            def batch_hook(b):
                _cdn_seed[0] += 1
                b.update(make_cdn_group(
                    b["cls"], b["bboxes"], b["mask"], nc=d["nc"], nq=nq_eff,
                    rng=_cdn_seed[0],
                ))
                return b

            batch_keys += ["dn_cls", "dn_bbox", "dn_attn_mask"]
        if bf16 is None:  # AMP analog: on for TPU by default (reference amp: True)
            bf16 = jax.default_backend() == "tpu"
        step_fn = make_train_step(
            self.model, tx, loss_cfg, task_loss=task_loss, bf16=bf16,
            accumulate=accumulate, remat=remat, boundaries=bounds,
        )

        start_epoch = 0
        save_dir_w = save_dir / "weights"
        if resume and not is_checkpoint(save_dir_w / "last"):
            # no checkpoint at project/name: fall back to the most recent
            # run under project (reference get_latest_run, utils/files.py:177)
            from fce_yolo_tpu.utils.files import get_latest_run

            latest = get_latest_run(str(project))
            if latest:
                save_dir = Path(latest).parent.parent
                save_dir_w = save_dir / "weights"
                if verbose:
                    print(f"resume: picked up latest run {save_dir}")
        if resume and is_checkpoint(save_dir_w / "last"):
            # full-state resume (reference check_resume/resume_training,
            # trainer.py:793-906): leaves are restored into a freshly-built
            # state treedef, so optimizer/EMA/WIoU state all continue exactly
            tree, meta0 = load_checkpoint(save_dir_w / "last")
            if "train_state_leaves" in tree:
                leaves_dict = tree["train_state_leaves"]
                flat, treedef = jax.tree_util.tree_flatten(state)
                loaded = [jnp.asarray(leaves_dict[str(i)]) for i in range(len(flat))]
                state = jax.tree_util.tree_unflatten(treedef, loaded)
                start_epoch = int(meta0.get("epoch", -1)) + 1
                if verbose:
                    print(f"resuming from epoch {start_epoch} ({save_dir_w / 'last'})")

        if device_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(device_mesh, P())
            data_sh = NamedSharding(device_mesh, P("dp"))
            state = jax.device_put(state, repl)
            step_fn = jax.jit(step_fn, donate_argnums=0, out_shardings=(repl, repl))
            # dn_attn_mask is (tgt, tgt) with no batch dim -> replicate
            put = lambda b: {
                k: jax.device_put(np.asarray(val), repl if k == "dn_attn_mask" else data_sh)
                for k, val in b.items()
            }
        else:
            step_fn = jax.jit(step_fn, donate_argnums=0)
            put = lambda b: b

        validator = (
            self._make_validator(imgsz=imgsz, batch_size=batch, workers=workers)
            if val
            else None
        )
        val_loader = validator.get_dataloader(d, "val") if validator else None

        stopper = EarlyStopping(patience)
        best_fitness = -1.0
        csv_path = save_dir / "results.csv"
        csv_rows: list[dict] = []
        t_start = time.time()

        if verbose:
            info = self.info()
            print(f"train: {self.cfg_yaml} scale={self.scale} params={info['params']:,} "
                  f"nc={d['nc']} imgsz={imgsz} batch={batch} epochs={epochs} "
                  f"steps/epoch={steps_per_epoch} optimizer={optim_cfg.optimizer}")

        cbs.fire("on_pretrain_routine_end", trainer=self)
        cbs.fire("on_train_start", trainer=self)
        for epoch in range(start_epoch, epochs):
            cbs.fire("on_train_epoch_start", trainer=self, epoch=epoch)
            loader.set_epoch(epoch, close_mosaic_at=close_mosaic, total_epochs=epochs)
            t0 = time.time()
            sums: dict[str, float] = {}
            nb = 0
            for b in loader:
                if batch_hook is not None:
                    b = batch_hook(dict(b))
                if (epoch == start_epoch and nb < 3
                        and hyp_overrides.get("plots", True)):
                    # first-epoch sample mosaics (reference
                    # plot_training_samples, trainer.py on_train_batch_end)
                    try:
                        from fce_yolo_tpu.utils.annotator import plot_images

                        plot_images(b, names=self.names,
                                    fname=save_dir / f"train_batch{nb}.jpg")
                    except Exception:
                        pass
                bdev = put({k: b[k] for k in batch_keys if k in b})
                state, m = step_fn(state, bdev)
                nb += 1
                if nb == 1 or nb % 10 == 0 or nb == steps_per_epoch:
                    vals = jax.device_get(
                        {k: m[k] for k in ("loss", "box", "cls", "dfl", "giou", "dn") if k in m}
                    )
                    for k, v in vals.items():  # one batched fetch, not 4 round trips
                        sums[k] = sums.get(k, 0.0) + float(v)
                    sums["_n"] = sums.get("_n", 0) + 1

            n_logged = max(sums.pop("_n", 1), 1)
            row = {
                "epoch": epoch,
                "time": round(time.time() - t_start, 2),
                "train/box_loss": sums.get("box", 0.0) / n_logged,
                "train/cls_loss": sums.get("cls", 0.0) / n_logged,
                "train/dfl_loss": sums.get("dfl", 0.0) / n_logged,
            }

            fitness = None
            if validator is not None:
                ema_vars = {"params": state.ema.params, "batch_stats": state.batch_stats}
                res = validator(ema_vars, dataloader=val_loader, verbose=False)
                fitness = res["fitness"]
                row.update({k: v for k, v in res.items() if k.startswith("metrics/")})
                row["fitness"] = fitness
            csv_rows.append(row)
            self._write_csv(csv_path, csv_rows)
            cbs.fire("on_fit_epoch_end", trainer=self, epoch=epoch, metrics=row)

            # checkpoints: last carries the FULL train state (resume-exact);
            # best carries EMA model weights only (reference trainer.py:584-624).
            # ONE batched device_get for the whole tree — per-leaf fetches pay
            # a full tunnel round trip each (~26 ms x ~700 leaves per epoch)
            host_state = jax.device_get(state)
            self.variables = {"params": host_state.ema.params,
                              "batch_stats": host_state.batch_stats}
            meta = {"cfg_yaml": self.cfg_yaml, "scale": self.scale, "nc": self.nc,
                    "names": self.names, "epoch": epoch, "fitness": fitness,
                    "git": _git_describe(),  # provenance (reference trainer.py:584-624)
                    "train_args": {"data": str(data), "epochs": epochs, "batch": batch,
                                   "imgsz": imgsz, "iou_type": iou_type}}
            flat, _ = jax.tree_util.tree_flatten(host_state)
            save_checkpoint(
                str(save_dir / "weights" / "last"),
                {"params": self.variables["params"],
                 "batch_stats": self.variables["batch_stats"],
                 "train_state_leaves": {str(i): x for i, x in enumerate(flat)}},
                meta,
            )
            if fitness is not None and fitness > best_fitness:
                best_fitness = fitness
                self.save(str(save_dir / "weights" / "best"), meta)
            if save_period > 0 and (epoch + 1) % save_period == 0:
                self.save(str(save_dir / "weights" / f"epoch{epoch}"), meta)
            if time_limit_hours is not None and (time.time() - t_start) > time_limit_hours * 3600:
                if verbose:
                    print(f"time limit {time_limit_hours}h reached at epoch {epoch + 1}")
                break

            if verbose:
                fit_s = f" fitness={fitness:.4f}" if fitness is not None else ""
                print(f"epoch {epoch + 1}/{epochs} loss(box/cls/dfl)="
                      f"{row['train/box_loss']:.3f}/{row['train/cls_loss']:.3f}/{row['train/dfl_loss']:.3f}"
                      f"{fit_s} ({time.time() - t0:.1f}s)")
            if stopper(epoch, fitness):
                if verbose:
                    print(f"early stop at epoch {epoch + 1} (patience {patience})")
                break

        cbs.fire("on_train_end", trainer=self)
        if hyp_overrides.get("plots", True):
            try:
                from fce_yolo_tpu.utils.plotting import plot_results

                plot_results(save_dir)  # training-curve grid (reference plot_results)
            except Exception as e:
                if verbose:
                    print(f"plot_results failed: {e}")
        # final: keep best weights loaded if we tracked fitness (reference final_eval)
        best_dir = save_dir / "weights" / "best"
        if best_fitness >= 0 and is_checkpoint(best_dir):
            tree, _ = load_checkpoint(best_dir)
            self.variables = {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
        return {
            "save_dir": str(save_dir),
            "best_fitness": best_fitness,
            "epochs_run": len(csv_rows),
            "results": csv_rows,
        }

    def _train_classify(
        self, data: str, epochs: int = 100, batch: int = 64, imgsz: int = 224,
        optimizer: str = "auto", lr0: float | None = None, lrf: float = 0.01,
        cos_lr: bool = False, patience: int = 100, workers: int = 8,
        project: str = "runs/classify", name: str = "train", val: bool = True,
        seed: int = 0, verbose: bool = True, **hyp,
    ) -> dict:
        """Classification training (reference ClassificationTrainer analog):
        class-folder dataset, CE loss, top-1 accuracy as fitness."""
        import jax
        import jax.numpy as jnp
        import optax as _optax

        from fce_yolo_tpu.data.classify import ClassificationDataset, classify_collate
        from fce_yolo_tpu.train.optim import EMA, OptimCfg, build_optimizer
        from fce_yolo_tpu.train.task_losses import classification_loss
        from fce_yolo_tpu.train.trainer import EarlyStopping

        root = Path(data)
        train_ds = ClassificationDataset(root / "train", imgsz=imgsz, mode="train", seed=seed)
        val_ds = ClassificationDataset(root / ("val" if (root / "val").exists() else "test"),
                                       imgsz=imgsz, mode="val") if val else None
        self.names = train_ds.names
        if len(self.names) != self.nc:
            self.model, self.spec, self.strides = build_model(
                self.cfg_yaml, scale=self.scale, nc=len(self.names)
            )
            self.variables = None
        v = self._ensure_variables(imgsz)

        n = len(train_ds)
        steps = max(n // batch, 1)
        cfg = OptimCfg(optimizer=optimizer, lr0=lr0 if lr0 is not None else 0.01, lrf=lrf,
                       cos_lr=cos_lr, batch_size=batch, epochs=epochs,
                       steps_per_epoch=steps, nc=len(self.names), **{
                           k: hyp[k] for k in ("momentum", "weight_decay", "warmup_epochs")
                           if k in hyp})
        tx = build_optimizer(cfg, v["params"])
        opt_state = tx.init(v["params"])
        ema = EMA.create(v["params"])
        model = self.model

        @jax.jit
        def step_fn(params, bstats, opt_state, ema, img, label):
            def loss_fn(p, bs):
                out, upd = model.apply({"params": p, "batch_stats": bs},
                                       img.astype(jnp.float32) / 255.0,
                                       train=True, mutable=["batch_stats"])
                loss, _ = classification_loss(out["logits"], label)
                return loss, upd["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, bstats)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = _optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, ema.update(new_params), loss

        @jax.jit
        def eval_fn(params, bstats, img, label):
            out = model.apply({"params": params, "batch_stats": bstats},
                              img.astype(jnp.float32) / 255.0, train=False)
            top1 = (jnp.argmax(out["logits"], -1) == label).mean()
            top5 = (jnp.argsort(-out["logits"], -1)[:, :5] == label[:, None]).any(-1).mean()
            return top1, top5

        params, bstats = v["params"], v.get("batch_stats", {})
        from fce_yolo_tpu.utils.files import increment_path

        save_dir = increment_path(Path(project) / name,
                                  exist_ok=bool(hyp.get("exist_ok")))
        (save_dir / "weights").mkdir(parents=True, exist_ok=True)
        stopper = EarlyStopping(patience)
        rng = np.random.default_rng(seed)
        rows, best = [], -1.0
        for epoch in range(epochs):
            train_ds.set_epoch(epoch)
            order = rng.permutation(n)
            losses = []
            for bi in range(steps):
                bidx = order[bi * batch : (bi + 1) * batch]
                if len(bidx) < batch:
                    break
                b = classify_collate([train_ds[int(j)] for j in bidx])
                params, bstats, opt_state, ema, loss = step_fn(
                    params, bstats, opt_state, ema, jnp.asarray(b["img"]), jnp.asarray(b["label"]))
                losses.append(float(loss))
            row = {"epoch": epoch, "train/loss": float(np.mean(losses)) if losses else 0.0}
            fitness = None
            if val_ds is not None:
                t1s, t5s = [], []
                for bi in range(0, len(val_ds), batch):
                    items = [val_ds[j] for j in range(bi, min(bi + batch, len(val_ds)))]
                    while len(items) < batch:
                        items.append(items[-1])
                    b = classify_collate(items)
                    t1, t5 = eval_fn(ema.params, bstats, jnp.asarray(b["img"]), jnp.asarray(b["label"]))
                    t1s.append(float(t1)); t5s.append(float(t5))
                row["metrics/accuracy_top1"] = fitness = float(np.mean(t1s))
                row["metrics/accuracy_top5"] = float(np.mean(t5s))
            rows.append(row)
            self._write_csv(save_dir / "results.csv", rows)
            self.variables = {"params": jax.device_get(ema.params), "batch_stats": jax.device_get(bstats)}
            meta = {"cfg_yaml": self.cfg_yaml, "scale": self.scale, "nc": self.nc,
                    "names": self.names, "epoch": epoch, "fitness": fitness}
            self.save(str(save_dir / "weights" / "last"), meta)
            if fitness is not None and fitness > best:
                best = fitness
                self.save(str(save_dir / "weights" / "best"), meta)
            if verbose:
                print(f"epoch {epoch + 1}/{epochs} loss={row['train/loss']:.3f}"
                      + (f" top1={fitness:.3f}" if fitness is not None else ""))
            if stopper(epoch, fitness):
                break
        return {"save_dir": str(save_dir), "best_fitness": best, "epochs_run": len(rows), "results": rows}

    @staticmethod
    def _write_csv(path: Path, rows: list[dict]):
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
