"""Inference benchmarking (reference utils/benchmarks.py:54 `benchmark`).

Times the full device pipeline (normalize -> forward -> decode -> NMS) at a
given batch size, and optionally vals a dataset for the mAP column. Prints
the reference-style table and returns rows as dicts.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import numpy as np

__all__ = ["benchmark", "profile_inference", "ProfileModels", "RF100Benchmark"]


def profile_inference(
    yolo, imgsz: int = 640, batch: int = 16, iters: int = 20, warmup: int = 3, bf16: bool = True
) -> dict[str, float]:
    """Measure e2e images/sec on the current default device."""
    import jax
    import jax.numpy as jnp

    from fce_yolo_tpu.ops import batched_nms

    variables = yolo._ensure_variables(imgsz)
    if bf16:
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"])
        variables = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        in_dtype = jnp.bfloat16
    else:
        in_dtype = jnp.float32
    model = yolo.model

    @jax.jit
    def predict(v, img_u8):
        x = img_u8.astype(in_dtype) / 255.0
        preds = model.apply(v, x, train=False)["preds"]
        out = batched_nms(preds, conf_thres=0.25, iou_thres=0.7, max_det=300)
        # scalar checksum: forces full computation even where block_until_ready
        # is a no-op (remote-tunnel plugins); see bench.py measurement notes
        return out["boxes"].sum() + out["scores"].sum()

    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(tiny(jnp.zeros(())))
    rt = (time.perf_counter() - t0) / 10

    rng = np.random.RandomState(0)
    imgs = [
        jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    for i in range(warmup):
        _ = float(predict(variables, imgs[i % 4]))
    t0 = time.perf_counter()
    outs = [predict(variables, imgs[i % 4]) for i in range(iters)]
    _ = float(sum(outs))
    dt = max(time.perf_counter() - t0 - rt, 1e-9) / iters
    return {
        "images_per_sec": batch / dt,
        "ms_per_image": dt / batch * 1000,
        "ms_per_batch": dt * 1000,
        "batch": batch,
        "imgsz": imgsz,
    }


EXPORT_FORMATS = ("stablehlo", "saved_model", "tflite")


def _bench_backend(backend, imgsz: int, iters: int = 8, warmup: int = 2) -> float:
    """ms/img through an AutoBackend runtime."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (backend.batch, imgsz, imgsz, 3)).astype(np.float32)
    for _ in range(warmup):
        backend(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        backend(x)
    return (time.perf_counter() - t0) / iters / backend.batch * 1000


def benchmark(
    yolo,
    data: str | None = None,
    imgsz: int = 640,
    batch: int = 16,
    formats: tuple[str, ...] | None = None,
    export_dir: str | None = None,
    verbose: bool = True,
) -> list[dict[str, Any]]:
    """Export every format, then time + (optionally) val each through its own
    runtime (reference utils/benchmarks.py:54: `benchmark()` = export matrix
    x AutoBackend val). The native JAX row is always first. A format that
    fails to export or run gets a FAILED row, like the reference's
    pandas-table contract.
    """
    import tempfile

    from fce_yolo_tpu.api import YOLO

    if isinstance(yolo, str):  # accept a spec path like the reference benchmark(model=...)
        yolo = YOLO(yolo)
    rows = []
    prof = profile_inference(yolo, imgsz=imgsz, batch=batch)
    row = {
        "format": "jax (native)",
        "status": "OK",
        "imgsz": imgsz,
        "batch": batch,
        "ms/img": round(prof["ms_per_image"], 2),
        "images/sec": round(prof["images_per_sec"], 1),
        "mAP50-95": None,
    }
    if data:
        res = yolo.val(data=data, imgsz=imgsz, batch=batch, verbose=False)
        row["mAP50-95"] = round(res["metrics/mAP50-95(B)"], 4)
    rows.append(row)

    tmp = tempfile.mkdtemp(prefix="fy_bench_") if export_dir is None else export_dir
    for fmt in formats if formats is not None else EXPORT_FORMATS:
        row = {"format": fmt, "status": "OK", "imgsz": imgsz, "batch": 1,
               "ms/img": None, "images/sec": None, "mAP50-95": None}
        try:
            from fce_yolo_tpu.engine.exporter import export_model

            path = export_model(yolo, fmt=fmt, imgsz=imgsz, out_dir=tmp)
            m = YOLO(path)  # routes through AutoBackend
            ms = _bench_backend(m.backend, imgsz)
            row["ms/img"] = round(ms, 2)
            row["images/sec"] = round(1000.0 / ms, 1)
            if data:
                res = m.val(data=data, imgsz=imgsz, batch=batch, verbose=False)
                row["mAP50-95"] = round(res["metrics/mAP50-95(B)"], 4)
        except Exception as e:  # keep the matrix going (reference try_export)
            row["status"] = f"FAILED: {type(e).__name__}: {e}"[:60]
        rows.append(row)

    if verbose:
        keys = list(rows[0].keys())
        print(" | ".join(f"{k:>12}" for k in keys))
        for r in rows:
            print(" | ".join(f"{str(v):>12}" for v in r.values()))
    return rows


class ProfileModels:
    """Profile a set of models for speed, parameters and FLOPs (reference
    ``ProfileModels``, utils/benchmarks.py:370).

    The reference times each model through ONNX-Runtime and TensorRT engines;
    those runtimes don't exist here, so the TPU-native re-scope times each
    spec through its natural runtime instead: .yaml configs and checkpoint
    dirs through the jitted JAX forward (bf16 when ``half``), exported
    artifacts (.tflite / SavedModel / .stablehlo / .fyir) through AutoBackend.
    Per-run wall times are outlier-cleaned with the reference's iterative
    sigma clipping before the mean±std row is printed.

    Examples:
        >>> ProfileModels(["yolo11n.yaml"], imgsz=640).run()
    """

    def __init__(
        self,
        paths: list[str],
        num_timed_runs: int = 100,
        num_warmup_runs: int = 10,
        min_time: float = 10.0,
        imgsz: int = 640,
        half: bool = True,
        verbose: bool = True,
    ):
        self.paths = list(paths)
        self.num_timed_runs = num_timed_runs
        self.num_warmup_runs = num_warmup_runs
        self.min_time = min_time
        self.imgsz = imgsz
        self.half = half
        self.verbose = verbose

    def get_files(self) -> list:
        """Expand the given paths: directories yield their contained model
        specs (.yaml / exported artifacts), files pass through sorted
        (reference get_files)."""
        from pathlib import Path

        files: list[Path] = []
        for p in self.paths:
            p = Path(p)
            if p.is_dir() and not (p / "saved_model.pb").exists() and not (p / "metadata.json").exists():
                for ext in ("*.yaml", "*.yml", "*.tflite", "*.stablehlo", "*.fyir"):
                    files += sorted(p.glob(ext))
            else:
                files.append(p)
        return files

    @staticmethod
    def iterative_sigma_clipping(data: np.ndarray, sigma: float = 2.0, max_iters: int = 3) -> np.ndarray:
        """Drop samples beyond ``sigma`` standard deviations of the mean,
        repeated up to ``max_iters`` times or until stable (reference
        iterative_sigma_clipping)."""
        data = np.asarray(data, np.float64)
        for _ in range(max_iters):
            mean, std = data.mean(), data.std()
            clipped = data[(data > mean - sigma * std) & (data < mean + sigma * std)]
            if len(clipped) == len(data) or len(clipped) == 0:
                break
            data = clipped
        return data

    def _sample_times(self, call) -> np.ndarray:
        """Per-call seconds: warmup, then run until both num_timed_runs and
        min_time are satisfied (reference's min_time extension rule)."""
        for _ in range(self.num_warmup_runs):
            call()
        times: list[float] = []
        total = 0.0
        while len(times) < self.num_timed_runs or total < self.min_time:
            t0 = time.perf_counter()
            call()
            dt = time.perf_counter() - t0
            times.append(dt)
            total += dt
            if len(times) >= 10 * self.num_timed_runs:  # hard cap
                break
        return np.asarray(times)

    def _profile_one(self, path) -> dict[str, Any]:
        import jax
        import jax.numpy as jnp

        from fce_yolo_tpu.api import YOLO

        m = YOLO(str(path))
        rng = np.random.RandomState(0)
        if m.backend is not None:
            imgsz = m.backend.imgsz or self.imgsz
            x = rng.randint(0, 255, (m.backend.batch, imgsz, imgsz, 3)).astype(np.float32)
            call = lambda: m.backend(x)  # noqa: E731
            batch, runtime = m.backend.batch, m.backend.fmt
            params = int(m.backend.meta.get("params", 0))
            gflops = float(m.backend.meta.get("gflops", 0.0))
        else:
            imgsz, batch, runtime = self.imgsz, 1, "jax (native)"
            variables = m._ensure_variables(imgsz)
            dtype = jnp.bfloat16 if self.half else jnp.float32
            if self.half:
                variables = {
                    "params": jax.tree_util.tree_map(lambda a: a.astype(dtype), variables["params"]),
                    "batch_stats": variables.get("batch_stats", {}),
                }
            model = m.model

            @jax.jit
            def fwd(v, img_u8):
                x = img_u8.astype(dtype) / 255.0
                out = model.apply(v, x, train=False)["preds"]
                return sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))

            img = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
            call = lambda: float(fwd(variables, img))  # noqa: E731
            info = m.info(flops=True, imgsz=imgsz)
            params, gflops = info["params"], info.get("gflops", 0.0)

        ms = self.iterative_sigma_clipping(self._sample_times(call) * 1000.0 / batch)
        return {
            "name": getattr(path, "stem", str(path)),
            "runtime": runtime,
            "imgsz": imgsz,
            "ms/img": round(float(ms.mean()), 2),
            "ms_std": round(float(ms.std()), 2),
            "params(M)": round(params / 1e6, 2),
            "FLOPs(B)": round(gflops, 2),
        }

    def run(self) -> list[dict[str, Any]]:
        """Profile every resolved file; print the reference-style markdown
        table; return the result rows."""
        files = self.get_files()
        if not files:
            print("No matching model files found to profile.")
            return []
        rows = []
        for f in files:
            try:
                rows.append(self._profile_one(f))
            except Exception as e:  # keep the table going, like try_export
                rows.append({"name": getattr(f, "stem", str(f)), "runtime": "FAILED",
                             "imgsz": self.imgsz, "ms/img": None, "ms_std": None,
                             "params(M)": None, "FLOPs(B)": None,
                             "error": f"{type(e).__name__}: {e}"[:80]})
        if self.verbose:
            print(f"| {'Model':<24} | {'runtime':<12} | {'imgsz':>5} | "
                  f"{'Speed (ms/im)':>16} | {'params (M)':>10} | {'FLOPs (B)':>9} |")
            print("|" + "-" * 26 + "|" + "-" * 14 + "|" + "-" * 7 + "|" + "-" * 18 + "|" + "-" * 12 + "|" + "-" * 11 + "|")
            for r in rows:
                spd = f"{r['ms/img']} ± {r['ms_std']}" if r["ms/img"] is not None else "FAILED"
                print(f"| {r['name']:<24} | {r['runtime']:<12} | {r['imgsz']:>5} | "
                      f"{spd:>16} | {str(r['params(M)']):>10} | {str(r['FLOPs(B)']):>9} |")
        return rows


class RF100Benchmark:
    """Multi-dataset val benchmark (reference utils/benchmarks.py:228).

    The reference drives the Roboflow-100 collection: download each dataset
    via the Roboflow SDK, val the model per dataset, scrape the console log
    for per-class mAP and append it to an eval log. This environment has no
    egress, so the TPU-native analog keeps the reference's workflow shape —
    ``parse_dataset`` -> per-dataset ``evaluate`` -> eval-log summary — over
    *local* dataset checkouts: any directory containing ``<ds>/data.yaml``
    laid out the Roboflow way (train/images, valid/images). Metrics come
    straight from the validator's dict instead of log scraping.
    """

    def __init__(self):
        self.ds_names: list[str] = []
        self.ds_cfg_list: list = []
        self.val_metrics = ["class", "images", "targets", "precision", "recall", "map50", "map95"]

    def set_key(self, api_key: str):
        """The reference wires the Roboflow SDK here; impossible offline."""
        raise RuntimeError(
            "RF100Benchmark.set_key: no network egress in this environment - "
            "place dataset checkouts locally and call parse_dataset(root_dir)")

    def parse_dataset(self, root_dir: str = "rf-100"):
        """Collect every `<dataset>/data.yaml` under root_dir (local analog
        of the reference's download loop)."""
        root = Path(root_dir)
        if not root.is_dir():
            raise FileNotFoundError(f"RF100Benchmark: {root} is not a directory")
        self.ds_names, self.ds_cfg_list = [], []
        for cfg in sorted(root.glob("*/data.yaml")):
            self.fix_yaml(cfg)
            self.ds_names.append(cfg.parent.name)
            self.ds_cfg_list.append(cfg)
        return self.ds_names, self.ds_cfg_list

    @staticmethod
    def fix_yaml(path):
        """Normalize Roboflow split paths (reference fix_yaml)."""
        import yaml as _yaml

        d = _yaml.safe_load(path.read_text())
        changed = d.get("train") != "train/images" or d.get("val") != "valid/images"
        if (path.parent / "train" / "images").exists():
            d["train"] = "train/images"
        if (path.parent / "valid" / "images").exists():
            d["val"] = "valid/images"
        if changed:
            path.write_text(_yaml.safe_dump(d, sort_keys=False))

    def evaluate(self, yaml_path, eval_log_file, model, list_ind: int = 0, **val_kw) -> float:
        """Val `model` on one dataset; append `name: mAP50` to the eval log.

        `model` is a YOLO facade (or anything with .val(data=...) returning a
        metrics dict) — the validator's numbers are used directly where the
        reference scrapes its console log.
        """
        res = model.val(data=str(yaml_path), verbose=False, **val_kw)
        map50 = float(res.get("metrics/mAP50(B)", res.get("map50", 0.0)))
        name = self.ds_names[list_ind] if list_ind < len(self.ds_names) else Path(str(yaml_path)).parent.name
        with open(eval_log_file, "a", encoding="utf-8") as f:
            f.write(f"{name}: {map50}\n")
        return map50

    def run(self, model, root_dir: str = "rf-100", eval_log_file: str = "rf100_eval.txt", **val_kw):
        """Convenience loop: parse + evaluate every local dataset; returns
        {name: mAP50}."""
        self.parse_dataset(root_dir)
        out = {}
        for i, cfg in enumerate(self.ds_cfg_list):
            out[self.ds_names[i]] = self.evaluate(cfg, eval_log_file, model, i, **val_kw)
        return out
