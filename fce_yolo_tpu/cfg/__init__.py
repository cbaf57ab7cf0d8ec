"""Run configuration: default merge, type checking, CLI entrypoint.

Analog of the reference's cfg/__init__.py (get_cfg:279, entrypoint:824):
a flat typed namespace from cfg/default.yaml, `k=v` CLI grammar with
fuzzy-mismatch suggestions (check_dict_alignment:463).
"""

from __future__ import annotations

import difflib
import sys
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import yaml

DEFAULT_CFG_PATH = Path(__file__).parent / "default.yaml"

# flags typed by constraint (reference cfg/__init__.py:81-118)
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace", "batch"}
CFG_FRACTION_KEYS = {
    "dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr",
    "mosaic", "mixup", "cutmix", "copy_paste", "conf", "iou", "fraction",
}
CFG_INT_KEYS = {
    "epochs", "patience", "workers", "seed", "close_mosaic", "max_det", "vid_stride",
    "line_width", "nbs", "save_period", "max_labels",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "resume", "profile", "multi_scale", "bf16", "val", "save_json", "plots", "visualize",
    "augment", "agnostic_nms", "show", "save_frames", "save_txt", "save_conf", "save_crop",
    "show_labels", "show_conf", "show_boxes", "int8", "dynamic", "nms", "pretrained",
}

TASKS = ("detect", "segment", "classify", "pose", "obb")
MODES = ("train", "val", "predict", "export", "track", "benchmark")

__all__ = ["get_cfg", "entrypoint", "DEFAULT_CFG_PATH", "load_default_cfg", "check_cfg"]


def load_default_cfg() -> dict[str, Any]:
    with open(DEFAULT_CFG_PATH) as f:
        return yaml.safe_load(f)


def _coerce(k: str, v: Any) -> Any:
    """Parse CLI string values into their typed form."""
    if not isinstance(v, str):
        return v
    low = v.lower()
    if low == "none":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if "," in v:
        return [_coerce(k, s) for s in v.split(",") if s]
    return v


def check_cfg(cfg: dict[str, Any]) -> dict[str, Any]:
    """Type-check known keys, raising readable errors (get_cfg:323-387)."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS | CFG_FRACTION_KEYS and not isinstance(v, (int, float)):
            raise TypeError(f"'{k}={v}' must be a number, got {type(v).__name__}")
        if k in CFG_FRACTION_KEYS and not (0.0 <= float(v) <= 1.0):
            raise ValueError(f"'{k}={v}' must be in [0, 1]")
        if k in CFG_INT_KEYS and not isinstance(v, int):
            if isinstance(v, float) and v.is_integer():
                cfg[k] = int(v)
            else:
                raise TypeError(f"'{k}={v}' must be an int, got {type(v).__name__}")
        if k in CFG_BOOL_KEYS and not isinstance(v, bool):
            raise TypeError(f"'{k}={v}' must be a bool, got {type(v).__name__}")
    return cfg


def check_dict_alignment(base: dict, custom: dict):
    """Reject unknown keys with did-you-mean suggestions (cfg/__init__.py:463)."""
    unknown = [k for k in custom if k not in base]
    if unknown:
        msgs = []
        for k in unknown:
            sim = difflib.get_close_matches(k, base.keys(), n=3, cutoff=0.5)
            hint = f" — did you mean {', '.join(repr(s) for s in sim)}?" if sim else ""
            msgs.append(f"'{k}' is not a valid argument{hint}")
        raise SyntaxError("\n".join(msgs))


def get_cfg(overrides: dict[str, Any] | None = None, cfg: dict | str | None = None) -> SimpleNamespace:
    """Merge default.yaml <- optional cfg file <- overrides, typed + validated."""
    base = load_default_cfg()
    if cfg:
        extra = yaml.safe_load(open(cfg)) if isinstance(cfg, str) else dict(cfg)
        check_dict_alignment(base, extra)
        base.update(extra)
    if overrides:
        overrides = {k: _coerce(k, v) for k, v in overrides.items()}
        check_dict_alignment(base, overrides)
        base.update(overrides)
    return SimpleNamespace(**check_cfg(base))


HELP_MSG = """FCE-YOLO-TPU CLI — usage:  yolo-tpu TASK MODE [k=v ...]

  TASK: detect (default) | segment | classify | pose | obb
  MODE: train | val | predict | track | export | benchmark
  or:   yolo-tpu solutions [count|heatmap|speed|queue|workout|crop|blur|
        isegment|visioneye|analytics|trackzone|inference] source=... [k=v ...]
  or:   yolo-tpu version | checks | settings [reset] [k=v ...] | cfg | copy-cfg

examples:
  yolo-tpu detect train data=coco_custom.yaml model=yolo11n-fce.yaml epochs=100 iou_type=WIoU
  yolo-tpu segment train data=coco8-seg.yaml model=yolo11n-seg.yaml epochs=10
  yolo-tpu classify val model=runs/classify/train/weights/best data=imagenet10/
  yolo-tpu pose predict model=yolo11n-pose.yaml source=images/
  yolo-tpu obb val model=yolo11n-obb.yaml data=dota8.yaml
"""

# reference cfg/__init__.py:64-70 TASK2MODEL (YAML analogs — no asset
# downloads in this environment)
TASK2MODEL = {
    "detect": "yolo11n.yaml",
    "segment": "yolo11n-seg.yaml",
    "classify": "yolo11n-cls.yaml",
    "pose": "yolo11n-pose.yaml",
    "obb": "yolo11n-obb.yaml",
}


# `yolo solutions NAME` routing (reference cfg/__init__.py:38 SOLUTION_MAP +
# handle_yolo_solutions:638); GUI-only streamlit app excluded
SOLUTION_MAP = {
    "count": "ObjectCounter",
    "crop": "ObjectCropper",
    "blur": "ObjectBlurrer",
    "workout": "AIGym",
    "heatmap": "Heatmap",
    "isegment": "InstanceSegmentation",
    "visioneye": "VisionEye",
    "speed": "SpeedEstimator",
    "queue": "QueueManager",
    "analytics": "Analytics",
    "inference": "Inference",
    "trackzone": "TrackZone",
}


def handle_solutions(args: list[str]) -> list:
    """`yolo-tpu solutions NAME [k=v ...]` -> run the solution over source,
    returning the per-frame SolutionResults list (reference
    handle_yolo_solutions; frames are saved when save_dir= is given)."""
    import fce_yolo_tpu.solutions as S

    name = args[0] if args and "=" not in args[0] else "count"
    if name == "help" or name not in SOLUTION_MAP:
        print(f"solutions: one of {sorted(SOLUTION_MAP)}")
        return []
    kv: dict[str, Any] = {}
    structured = ("region", "regions", "slots", "selected_ids", "kpts", "classes")
    for a in args[1:] if (args and "=" not in args[0]) else args:
        k, v = a.split("=", 1)
        if k in structured:  # python-literal values like [(0,50),(100,50)]
            import ast

            kv[k] = ast.literal_eval(v)
        else:
            kv[k] = _coerce(k, v)
    source = kv.pop("source", None)
    assert source, "solutions requires source=<path>"
    save_dir = kv.pop("save_dir", None)
    sol = getattr(S, SOLUTION_MAP[name])(**kv)
    results = []
    for i, r in enumerate(sol(source)):
        results.append(r)
        if save_dir and r.plot_im is not None:
            import cv2

            p = Path(save_dir)
            p.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p / f"{i:06d}.jpg"), r.plot_im)
    return results


def handle_settings(args: list[str]) -> dict:
    """`yolo-tpu settings [reset] [k=v ...]` (reference handle_yolo_settings:
    cfg/__init__.py:555) — print, reset, or update the persistent settings."""
    from fce_yolo_tpu.utils.settings import SETTINGS

    if args and args[0] == "reset":
        SETTINGS.reset()
        print("settings reset to defaults")
    elif args:
        SETTINGS.update({k: _coerce(k, v) for k, v in
                         (a.split("=", 1) for a in args if "=" in a)})
    print(f"settings file: {SETTINGS.path}")
    for k, v in SETTINGS.items():
        print(f"  {k}={v}")
    return dict(SETTINGS)


def copy_default_cfg() -> Path:
    """Copy default.yaml next to cwd for editing (reference copy_default_cfg,
    cfg/__init__.py:805) and print the follow-up usage hint."""
    import shutil

    dst = Path.cwd() / DEFAULT_CFG_PATH.name.replace(".yaml", "_copy.yaml")
    shutil.copy2(DEFAULT_CFG_PATH, dst)
    print(f"{DEFAULT_CFG_PATH} copied to {dst}\n"
          f"usage example: yolo-tpu cfg={dst.name} detect train data=coco8.yaml")
    return dst


def entrypoint(argv: list[str] | None = None) -> Any:
    """CLI: `yolo-tpu [task] [mode] k=v ...` (reference entrypoint:824-995)."""
    args = list(argv if argv is not None else sys.argv[1:])
    if not args:
        print(HELP_MSG)
        return None

    # special no-mode commands (reference entrypoint:853-870), accepted with
    # the same spelling forgiveness: singular forms and -/-- prefixes
    def _version():
        import fce_yolo_tpu

        print(fce_yolo_tpu.__version__)
        return fce_yolo_tpu.__version__

    def _checks():
        from fce_yolo_tpu.utils.checks import collect_system_info

        return collect_system_info()

    special = {
        "help": lambda rest: print(HELP_MSG),
        "version": lambda rest: _version(),
        "checks": lambda rest: _checks(),
        "settings": handle_settings,
        "cfg": lambda rest: print(DEFAULT_CFG_PATH.read_text()),
        "copy-cfg": lambda rest: copy_default_cfg(),
        "solutions": handle_solutions,
    }
    aliases = dict(special)
    for k in list(special):
        if len(k) > 1 and k.endswith("s"):
            aliases[k[:-1]] = special[k]  # singular: "setting", "check"
    for k in list(aliases):
        aliases[f"-{k}"] = aliases[f"--{k}"] = aliases[k]
    aliases["-h"] = aliases["help"]

    task, mode, kv = "detect", None, {}
    for i, a in enumerate(args):
        if "=" in a and not a.startswith("-"):
            k, v = a.split("=", 1)
            kv[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a.lower() in aliases:
            return aliases[a.lower()](args[i + 1:])
        elif a in CFG_BOOL_KEYS:
            kv[a] = "true"  # bare bool flag, e.g. `yolo-tpu predict ... save`
        else:
            raise SyntaxError(f"unrecognized argument {a!r}\n{HELP_MSG}")
    if mode is None:
        raise SyntaxError(f"no mode given (one of {MODES})\n{HELP_MSG}")

    # default model per task (reference entrypoint:931 TASK2MODEL); when a
    # model IS given, its spec decides the task (reference guess_model_task)
    model_src = kv.pop("model", None) or TASK2MODEL[task]
    source = kv.pop("source", None)
    data = kv.pop("data", None)
    cfg_file = kv.pop("cfg", None)  # cfg=custom.yaml full-config override
    if cfg_file:
        print(f"Overriding {DEFAULT_CFG_PATH} with {cfg_file}")
    cfg = get_cfg(cfg=cfg_file,
                  overrides={**kv, "task": task, "mode": mode, "model": model_src})

    if cfg.device:  # NOTE: the JAX_PLATFORMS env var is ignored under the
        import jax  # axon TPU plugin; only the config API selects platforms

        jax.config.update("jax_platforms", str(cfg.device))

    from fce_yolo_tpu.api import YOLO
    from fce_yolo_tpu.utils.events import EVENTS

    EVENTS(cfg)  # local JSONL spool; only when SETTINGS["sync"] opts in
    model = YOLO(model_src)
    if mode == "train":
        assert data, "train requires data=<dataset.yaml>"
        return model.train(
            data=data, epochs=cfg.epochs, batch=int(cfg.batch), imgsz=cfg.imgsz,
            optimizer=cfg.optimizer, lr0=kv.get("lr0") and float(kv["lr0"]), lrf=cfg.lrf,
            cos_lr=cfg.cos_lr, iou_type=cfg.iou_type, close_mosaic=cfg.close_mosaic,
            patience=cfg.patience, workers=cfg.workers, max_labels=cfg.max_labels,
            project=cfg.project or f"runs/{model.task}", name=cfg.name or "train",
            val=cfg.val, save_period=cfg.save_period, seed=cfg.seed, verbose=cfg.verbose,
            hsv_h=cfg.hsv_h, hsv_s=cfg.hsv_s, hsv_v=cfg.hsv_v, degrees=cfg.degrees,
            translate=cfg.translate, scale=cfg.scale, shear=cfg.shear,
            perspective=cfg.perspective, flipud=cfg.flipud, fliplr=cfg.fliplr,
            mosaic=cfg.mosaic, mixup=cfg.mixup, cutmix=cfg.cutmix,
        )
    if mode == "val":
        assert data, "val requires data=<dataset.yaml>"
        res = model.val(data=data, imgsz=cfg.imgsz, batch=int(cfg.batch),
                        conf=cfg.conf or 0.001, iou=cfg.iou, max_det=cfg.max_det,
                        workers=cfg.workers, verbose=cfg.verbose)
        return {k: v for k, v in res.items() if isinstance(v, float)}
    if mode == "predict":
        assert source, "predict requires source=<path>"
        results = model.predict(source, conf=cfg.conf or 0.25, iou=cfg.iou,
                                imgsz=cfg.imgsz, max_det=cfg.max_det)
        if cfg.verbose:  # reference per-image log line (engine/predictor.py)
            for i, r in enumerate(results):
                print(f"image {i + 1}/{len(results)} {r.path}: {r.verbose()}")
        if cfg.save or cfg.save_txt or cfg.save_crop:
            out_dir = Path(cfg.project or f"runs/{model.task}") / (cfg.name or "predict")
            out_dir.mkdir(parents=True, exist_ok=True)
            for i, r in enumerate(results):
                if r.path in ("array", "pil"):
                    stem = f"im{i}"
                elif "#frame" in r.path:  # video source: one file per frame
                    v, fi = r.path.rsplit("#frame", 1)
                    stem = f"{Path(v).stem}_frame{fi}"
                else:
                    stem = Path(r.path).stem
                if cfg.save:
                    r.save(str(out_dir / f"{stem}.jpg"))
                if cfg.save_txt:
                    r.save_txt(str(out_dir / "labels" / f"{stem}.txt"), save_conf=cfg.save_conf)
                if cfg.save_crop:
                    r.save_crop(str(out_dir / "crops"), f"{stem}.jpg")
        return results
    if mode == "track":
        assert source, "track requires source=<path>"
        out = model.track(source, tracker=cfg.tracker, conf=cfg.conf or 0.25,
                          iou=cfg.iou, imgsz=cfg.imgsz)
        if cfg.save:  # annotated frames with track ids (reference save=True)
            import cv2

            from fce_yolo_tpu.solutions.annotator import SolutionAnnotator

            out_dir = Path(cfg.project or f"runs/{model.task}") / (cfg.name or "track")
            out_dir.mkdir(parents=True, exist_ok=True)
            for i, (r, tracks) in enumerate(out):
                ann = SolutionAnnotator(r.orig_img.copy(), cfg.line_width or 2)
                for row in tracks:
                    ann.box_label(row[:4], f"id{int(row[4])} {model.names.get(int(row[6]), '')}",
                                  color=(0, 255, 0))
                cv2.imwrite(str(out_dir / f"{i:06d}.jpg"), ann.result())
        return out
    if mode == "export":
        from fce_yolo_tpu.engine.exporter import export_model

        return export_model(model, fmt=cfg.format, imgsz=cfg.imgsz, nms=cfg.nms, int8=cfg.int8)
    if mode == "benchmark":
        from fce_yolo_tpu.utils.benchmarks import benchmark

        return benchmark(model, imgsz=cfg.imgsz, data=data)
    raise NotImplementedError(f"mode {mode!r}")
