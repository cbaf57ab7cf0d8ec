"""YOLO-format detection dataset: file scan, label parse/cache, collate.

Behavioral contract follows the reference data layer (data/base.py:23
BaseDataset scan + data/dataset.py:49 YOLODataset label cache +
data/utils.py check_det_dataset) but re-designed for the TPU input
pipeline: __getitem__ returns raw numpy samples; `collate` pads labels to
a static per-batch capacity so the downstream jitted train step never
recompiles (static shapes, SURVEY.md §7).

Dataset YAML schema (same as reference cfg/datasets/*.yaml):
    path: <root>            # dataset root
    train: images/train     # dir, file list .txt, or list thereof
    val: images/val
    names: {0: person, ...} # or list
Labels live in the sibling `labels/` tree as one .txt per image:
`cls cx cy w h` normalized xywh per line (converted to pixel xyxy here).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import cv2
import numpy as np
import yaml

from fce_yolo_tpu.data.augment import AugmentCfg, train_augment, val_transform
from fce_yolo_tpu.utils.patches import imread

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}

__all__ = ["check_det_dataset", "YOLODataset", "collate",
           "polygon2mask", "polygons2masks", "polygons2masks_overlap"]


def _resolve_dataset_yaml(dataset: str | Path) -> Path:
    """Resolve a dataset spec to a YAML file path.

    Mirrors the reference's name lookup (data/utils.py check_det_dataset +
    checks.check_file): an existing path wins; otherwise a bare name like
    ``coco8.yaml`` / ``coco8`` resolves against the packaged registry
    (``fce_yolo_tpu/cfg/datasets/``), so reference-style ``data=coco8.yaml``
    CLI calls work unchanged.
    """
    p = Path(dataset)
    if p.exists():
        return p
    registry = Path(__file__).resolve().parent.parent / "cfg" / "datasets"
    name = p.name if p.suffix in (".yaml", ".yml") else p.name + ".yaml"
    for cand in (registry / name, registry / name.replace(".yml", ".yaml")):
        if cand.exists():
            return cand
    hits = sorted(registry.glob("*.yaml"))
    known = ", ".join(h.stem for h in hits)
    raise FileNotFoundError(
        f"dataset '{dataset}' not found as a file and not in the packaged "
        f"registry ({known})")


def check_det_dataset(dataset: str | dict) -> dict:
    """Load + normalize a dataset YAML (reference data/utils.py check_det_dataset).

    Returns {"path", "train", "val", "names", "nc"} with absolute paths.
    Bare names resolve against the packaged cfg/datasets registry. No
    auto-download (zero-egress environment) — missing paths raise with the
    dataset's original download URL in the message when known.
    """
    if isinstance(dataset, (str, Path)):
        dataset = _resolve_dataset_yaml(dataset)
        with open(dataset) as f:
            d = yaml.safe_load(f)
        yaml_dir = Path(dataset).resolve().parent
    else:
        d, yaml_dir = dict(dataset), Path.cwd()

    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    elif names is None and "nc" in d:
        names = {i: f"class_{i}" for i in range(d["nc"])}
    d["names"] = {int(k): str(v) for k, v in names.items()}
    d["nc"] = len(d["names"])

    root = Path(d.get("path", ".")).expanduser()
    if not root.is_absolute():
        # Data next to the YAML wins (local fixtures); otherwise resolve
        # against the datasets dir (FY_DATASETS_DIR env > SETTINGS), the
        # reference's DATASETS_DIR semantics (data/utils.py).
        local = (yaml_dir / root).resolve()
        if local.exists():
            root = local
        else:
            from fce_yolo_tpu.utils.settings import SETTINGS
            base = Path(os.environ.get("FY_DATASETS_DIR", SETTINGS["datasets_dir"])).expanduser()
            root = (base if base.is_absolute() else Path.cwd() / base) / root
    d["path"] = str(root)
    for split in ("train", "val", "test"):
        if d.get(split):
            v = d[split]
            vv = [v] if isinstance(v, str) else list(v)
            resolved = [str(p if os.path.isabs(p) else root / p) for p in vv]
            d[split] = resolved[0] if isinstance(v, str) else resolved
            for p in resolved:
                if not os.path.exists(p):
                    hint = f" (no auto-download here; original source: {d['download']})" if d.get("download") else ""
                    raise FileNotFoundError(f"dataset {split} path not found: {p}{hint}")
    return d


def img2label_path(img_path: str) -> str:
    """images/.../x.jpg -> labels/.../x.txt (reference data/utils.py img2label_paths)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def _scan_images(src: str | list) -> list[str]:
    files: list[str] = []
    for p in [src] if isinstance(src, str) else src:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*")) if f.suffix[1:].lower() in IMG_FORMATS]
        elif p.is_file() and p.suffix == ".txt":
            base = p.parent
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    files.append(str((base / line).resolve()) if not os.path.isabs(line) else line)
        elif p.is_file():
            files.append(str(p))
        else:
            raise FileNotFoundError(f"image source not found: {p}")
    return files


class YOLODataset:
    """Detection dataset over YOLO-format image/label trees.

    Args:
        img_path: dir / txt-list / list of them (a split from the data YAML).
        imgsz: output size (square letterbox or mosaic target).
        mode: "train" (full augment pipeline) or "val" (letterbox only).
        hyp: augmentation hyperparameters.
        cache_labels: persist a parsed-label .npz next to the label tree,
            keyed by the file-list hash (reference's .cache analog).
    """

    def __init__(
        self,
        img_path: str | list,
        imgsz: int = 640,
        mode: str = "train",
        hyp: AugmentCfg | None = None,
        nc: int | None = None,
        cache_labels: bool = True,
        seed: int = 0,
        task: str = "detect",
        kpt_shape: tuple[int, int] = (17, 3),
        flip_idx: list[int] | None = None,
        rect: bool = False,
        stride: int = 32,
        pad: float = 0.5,
        batch_size: int = 16,
        cache: str | None = None,
    ):
        self.imgsz = imgsz
        self.mode = mode
        self.hyp = hyp or AugmentCfg()
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.flip_idx = flip_idx
        self.rect = rect
        self.stride = stride
        self.pad = pad
        self.batch_size = batch_size
        if task == "pose" and not flip_idx:
            # flips require the left/right keypoint swap map (reference
            # v8_transforms: disables flips when flip_idx is absent)
            from dataclasses import replace

            self.hyp = replace(self.hyp, fliplr=0.0, flipud=0.0)
        self.mosaic_enabled = mode == "train"
        self.im_files = _scan_images(img_path)
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {img_path}")
        self.labels = self._load_labels(cache_labels)
        self.nc = nc if nc is not None else int(max((l["cls"].max() for l in self.labels if l["cls"].size), default=0) + 1)
        self._rng = np.random.default_rng(seed)
        self.batch_shapes: np.ndarray | None = None
        if rect:
            self._set_rectangle()
        self._ims: list | None = None
        self._npy_files: list[Path] | None = None
        self.cache = cache
        if cache:
            self._cache_images()

    def _set_rectangle(self) -> None:
        """Aspect-ratio sort + per-batch stride-aligned shape bins (reference
        data/base.py:349 set_rectangle). Iterating in order with
        ``shuffle=False`` then yields whole batches of one shape each — on
        TPU every distinct bin compiles once and is then cached.
        """
        shapes = []
        for f in self.im_files:
            img = imread(f)
            shapes.append(img.shape[:2] if img is not None else (self.imgsz, self.imgsz))
        s = np.array(shapes, np.float64)  # (N, 2) hw
        ar = s[:, 0] / s[:, 1]
        irect = ar.argsort()
        self.im_files = [self.im_files[i] for i in irect]
        self.labels = [self.labels[i] for i in irect]
        ar = ar[irect]

        bi = np.floor(np.arange(len(self.im_files)) / self.batch_size).astype(int)
        nb = int(bi[-1]) + 1
        batch_shapes = [[1.0, 1.0]] * nb
        for i in range(nb):
            ari = ar[bi == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                batch_shapes[i] = [maxi, 1.0]
            elif mini > 1:
                batch_shapes[i] = [1.0, 1.0 / mini]
        self.batch_shapes = (
            np.ceil(np.array(batch_shapes) * self.imgsz / self.stride + self.pad).astype(int)
            * self.stride
        )
        self._batch_index = bi

    def _mem_available(self) -> int:
        try:
            import psutil

            return psutil.virtual_memory().available
        except ImportError:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemAvailable"):
                        return int(line.split()[1]) * 1024
        return 0

    def _cache_images(self) -> None:
        """RAM or disk (.npy) image cache with the reference's safety margins
        (data/base.py:263-347): sample 30 images, extrapolate total size, and
        silently disable when space is short.
        """
        n = len(self.im_files)
        sample_idx = self._rng.choice(n, size=min(n, 30), replace=False)
        b = 0
        for i in sample_idx:
            img = imread(self.im_files[int(i)])
            if img is not None:
                b += img.nbytes
        required = b * n / max(len(sample_idx), 1) * 1.5  # +50% safety margin
        if self.cache == "disk":
            import shutil

            parent = Path(self.im_files[0]).parent
            if not os.access(parent, os.W_OK) or required > shutil.disk_usage(parent).free:
                self.cache = None
                return
            self._npy_files = []
            from fce_yolo_tpu.utils.tqdm import TQDM

            for f in TQDM(self.im_files, desc="Caching images (disk)", unit="img"):
                npy = Path(f).with_suffix(".npy")
                if not npy.exists():
                    img = imread(f)
                    if img is not None:
                        np.save(str(npy), img, allow_pickle=False)
                self._npy_files.append(npy)
        else:  # ram
            if required > self._mem_available():
                self.cache = None
                return
            from fce_yolo_tpu.utils.tqdm import TQDM

            self._ims = [imread(f) for f in TQDM(self.im_files, desc="Caching images (ram)", unit="img")]

    def _load_labels(self, use_cache: bool) -> list[dict]:
        # cache key covers paths + label mtimes/sizes + task, so edited label
        # files invalidate the cache (reference keys its .cache on a file hash
        # too, data/dataset.py cache_labels)
        h = hashlib.sha1()
        h.update(self.task.encode())
        for f in self.im_files:
            h.update(f.encode())
            lp = img2label_path(f)
            try:
                st = os.stat(lp)
                h.update(f"{st.st_mtime_ns}:{st.st_size}".encode())
            except OSError:
                h.update(b"missing")
        key = h.hexdigest()[:16]
        cache_path = Path(self.im_files[0]).parent / f".labels_{key}.npz"
        if use_cache and cache_path.exists():
            z = np.load(cache_path, allow_pickle=True)
            return list(z["labels"])
        labels = []
        for f in self.im_files:
            lp = img2label_path(f)
            rows = []
            if os.path.exists(lp):
                rows = [l.split() for l in Path(lp).read_text().splitlines() if l.strip()]
            if rows and self.task == "pose":
                # cls cx cy w h px py [pv] x nkpt (reference pose label format)
                nk, nd = self.kpt_shape
                cls, xywhn, kpts = [], [], []
                for r in rows:
                    vals = np.array(r[1:], np.float32)
                    cls.append(float(r[0]))
                    xywhn.append(vals[:4])
                    k = vals[4 : 4 + nk * nd].reshape(nk, nd)
                    if nd == 2:  # synthesize visibility
                        k = np.concatenate([k, np.ones((nk, 1), np.float32)], 1)
                    kpts.append(k)
                labels.append({"cls": np.array(cls, np.float32),
                               "xywhn": np.stack(xywhn) if xywhn else np.zeros((0, 4), np.float32),
                               "keypoints": kpts})
            elif rows and self.task == "obb":
                # DOTA-YOLO: cls x1 y1 x2 y2 x3 y3 x4 y4 (normalized corners)
                cls, xywhn, polys = [], [], []
                for r in rows:
                    pts = np.array(r[1:9], np.float32).reshape(4, 2)
                    cls.append(float(r[0]))
                    lo, hi = pts.min(0), pts.max(0)
                    xywhn.append([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]])
                    polys.append(pts)
                labels.append({"cls": np.array(cls, np.float32),
                               "xywhn": np.array(xywhn, np.float32),
                               "segments": polys})  # corners ride the polygon path
            elif rows and len(rows[0]) > 5:
                # segment format: cls x1 y1 x2 y2 ... (normalized polygon;
                # reference data/utils.py verify_image_label segments branch)
                cls, xywhn, segs = [], [], []
                for r in rows:
                    pts = np.array(r[1:], np.float32).reshape(-1, 2)
                    cls.append(float(r[0]))
                    lo, hi = pts.min(0), pts.max(0)
                    xywhn.append([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]])
                    segs.append(pts)
                labels.append(
                    {"cls": np.array(cls, np.float32), "xywhn": np.array(xywhn, np.float32), "segments": segs}
                )
            else:
                arr = np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32)
                labels.append({"cls": arr[:, 0], "xywhn": arr[:, 1:5]})
        if use_cache:
            try:
                np.savez_compressed(cache_path, labels=np.array(labels, dtype=object))
            except OSError:
                pass
        return labels

    def __len__(self) -> int:
        return len(self.im_files)

    def set_epoch(self, epoch: int, close_mosaic_at: int | None = None, total_epochs: int | None = None):
        """Reseed and handle mosaic-close (reference trainer.py:396-398)."""
        self._rng = np.random.default_rng(hash((epoch, len(self))) & 0x7FFFFFFF)
        if close_mosaic_at and total_epochs and epoch >= total_epochs - close_mosaic_at:
            self.mosaic_enabled = False

    def load_raw(self, i: int) -> dict:
        """Decode image i and return pixel-xyxy labels (+ pixel polygons)."""
        if self._ims is not None:  # RAM cache
            img = self._ims[i]
        elif self._npy_files is not None and self._npy_files[i].exists():  # disk cache
            img = np.load(str(self._npy_files[i]))
        else:
            img = imread(self.im_files[i])  # BGR HWC uint8
        if img is None:
            raise FileNotFoundError(f"failed to read image {self.im_files[i]}")
        h, w = img.shape[:2]
        lab = self.labels[i]
        xywh = lab["xywhn"] * np.array([w, h, w, h], np.float32)
        boxes = np.empty_like(xywh)
        if len(xywh):
            boxes[:, 0] = xywh[:, 0] - xywh[:, 2] / 2
            boxes[:, 1] = xywh[:, 1] - xywh[:, 3] / 2
            boxes[:, 2] = xywh[:, 0] + xywh[:, 2] / 2
            boxes[:, 3] = xywh[:, 1] + xywh[:, 3] / 2
        out = {"img": img, "cls": lab["cls"].copy(), "bboxes": boxes}
        if "segments" in lab:
            out["segments"] = [s * np.array([w, h], np.float32) for s in lab["segments"]]
        if "keypoints" in lab:
            scale = np.array([w, h, 1], np.float32)
            out["keypoints"] = [k * scale for k in lab["keypoints"]]
        return out

    def __getitem__(self, i: int) -> dict:
        if self.mode == "train":
            out = train_augment(
                self.load_raw, i, len(self), self.imgsz, self.hyp, self._rng, self.mosaic_enabled
            )
        else:
            raw = self.load_raw(i)
            if self.batch_shapes is not None:  # rect val: this image's bin shape
                shape = tuple(int(v) for v in self.batch_shapes[self._batch_index[i]])
                # reference rect-val semantics (base.py:240-244): the image is
                # FIRST resized long-side -> imgsz (ceil, INTER_LINEAR), then
                # the letterbox only PADS to the batch bin (scaleup=False, so
                # its second ratio is ~1) — NOT a direct min-scale to the bin.
                orig_shape = raw["img"].shape[:2]
                h0, w0 = orig_shape
                r0 = self.imgsz / max(h0, w0)
                if r0 != 1.0:
                    import math as _math

                    nw = min(_math.ceil(w0 * r0), self.imgsz)
                    nh = min(_math.ceil(h0 * r0), self.imgsz)
                    sx, sy = nw / w0, nh / h0
                    raw = dict(raw)
                    raw["img"] = cv2.resize(raw["img"], (nw, nh), interpolation=cv2.INTER_LINEAR)
                    scale4 = np.array([sx, sy, sx, sy], np.float32)
                    raw["bboxes"] = raw["bboxes"] * scale4
                    if "segments" in raw:
                        raw["segments"] = [s * np.array([sx, sy], np.float32) for s in raw["segments"]]
                    if "keypoints" in raw:
                        raw["keypoints"] = [
                            k * np.array([sx, sy, 1], np.float32) for k in raw["keypoints"]
                        ]
                out = val_transform(raw, shape)
                # compose the scale-back mapping to TRUE original pixels
                out["ratio"] = out["ratio"] * r0 if r0 != 1.0 else out["ratio"]
                out["orig_shape"] = orig_shape
            else:
                out = val_transform(raw, self.imgsz)
        # BGR -> RGB at the pipeline exit (reference Format transform,
        # augment.py:2119 with bgr=0.0): the model consumes RGB; cv2-space
        # augments (HSV) run on BGR before this point, like the reference.
        out["img"] = np.ascontiguousarray(out["img"][..., ::-1])
        return out


def collate(samples: list[dict], max_labels: int = 128, mask_ratio: int = 4, obb: bool = False,
            mask_overlap: bool = True) -> dict:
    """Pad a list of samples into one static-shape batch.

    Output: img (B, S, S, 3) uint8 NHWC; cls (B, M); bboxes (B, M, 4)
    normalized xywh; mask (B, M) bool — the train-step batch contract
    (train/loss.py detection_loss). Images stay uint8; /255 happens inside
    the jit so the host->device copy is 4x smaller. When samples carry
    polygon "segments", a per-instance binary "masks" (B, M, S/mask_ratio,
    S/mask_ratio) plane is rasterized for the segmentation loss (mask_ratio
    matches reference cfg/default.yaml mask_ratio: 4).
    """
    b = len(samples)
    sh, sw = samples[0]["img"].shape[:2]
    img = np.stack([x["img"] for x in samples], 0)
    cls = np.zeros((b, max_labels), np.float32)
    bboxes = np.zeros((b, max_labels, 4), np.float32)
    mask = np.zeros((b, max_labels), bool)
    has_segments = any("segments" in x for x in samples) and not obb
    has_kpts = any("keypoints" in x for x in samples)
    nk = max((len(x["keypoints"][0]) for x in samples if x.get("keypoints")), default=17) if has_kpts else 0
    smh, smw = sh // mask_ratio, sw // mask_ratio
    seg_masks = np.zeros((b, max_labels, smh, smw), np.float32) if has_segments else None
    kpts_arr = np.zeros((b, max_labels, nk, 3), np.float32) if has_kpts else None
    rboxes = np.zeros((b, max_labels, 5), np.float32) if obb else None
    for i, x in enumerate(samples):
        n = min(len(x["cls"]), max_labels)
        if n:
            cls[i, :n] = x["cls"][:n]
            xyxy = x["bboxes"][:n]
            h, w = x["img"].shape[:2]
            cx = (xyxy[:, 0] + xyxy[:, 2]) / 2 / w
            cy = (xyxy[:, 1] + xyxy[:, 3]) / 2 / h
            bw = (xyxy[:, 2] - xyxy[:, 0]) / w
            bh = (xyxy[:, 3] - xyxy[:, 1]) / h
            bboxes[i, :n] = np.stack([cx, cy, bw, bh], 1)
            mask[i, :n] = True
            if has_segments and "segments" in x:
                scale = np.array([smw / w, smh / h], np.float32)
                for j, seg in enumerate(x["segments"][:n]):
                    pts = np.round(seg * scale).astype(np.int32)
                    if len(pts) >= 3:
                        cv2.fillPoly(seg_masks[i, j], [pts], 1.0)
            if has_kpts and "keypoints" in x:
                norm = np.array([1.0 / w, 1.0 / h, 1.0], np.float32)
                for j, kp in enumerate(x["keypoints"][:n]):
                    kpts_arr[i, j] = kp * norm
            if obb and "segments" in x:
                # 4-corner polygon -> minimal rotated rect, normalized xywhr
                for j, seg in enumerate(x["segments"][:n]):
                    (rcx, rcy), (rw, rh), ang = cv2.minAreaRect(seg.astype(np.float32))
                    # canonical: long side = w, angle in [-pi/4, 3pi/4)
                    theta = np.deg2rad(ang)
                    if rw < rh:
                        rw, rh = rh, rw
                        theta += np.pi / 2
                    theta = (theta + np.pi / 4) % np.pi - np.pi / 4
                    rboxes[i, j] = [rcx / w, rcy / h, rw / w, rh / h, theta]
    if seg_masks is not None and mask_overlap:
        # reference polygons2masks_overlap semantics (data/utils.py): every
        # pixel belongs to exactly ONE instance — draw area-descending so
        # smaller instances overwrite larger ones. The reference uses this
        # for train GT (overlap_mask default) AND val GT, so mask mAP parity
        # requires it.
        for i in range(b):
            inst = seg_masks[i]  # (M, h, w)
            areas = inst.reshape(inst.shape[0], -1).sum(1)
            order = np.argsort(-areas)
            plane = np.zeros(inst.shape[1:], np.int32)
            for j in order:
                if areas[j] > 0:
                    plane[inst[j] > 0.5] = j + 1
            for j in range(inst.shape[0]):
                if areas[j] > 0:
                    inst[j] = (plane == j + 1).astype(np.float32)
    out = {"img": img, "cls": cls, "bboxes": bboxes, "mask": mask}
    if seg_masks is not None:
        out["masks"] = seg_masks
    if kpts_arr is not None:
        out["keypoints"] = kpts_arr
    if rboxes is not None:
        out["bboxes"] = rboxes  # (B, M, 5) xywhr replaces the axis-aligned boxes
    if "txt_feats" in samples[0]:  # multimodal: per-sample text embeddings
        out["txt_feats"] = np.stack([x["txt_feats"] for x in samples], 0).astype(np.float32)
    if "visual_prompts" in samples[0]:  # yoloe vp-train: per-class P3 masks
        out["visual_prompts"] = np.stack([x["visual_prompts"] for x in samples], 0)
    if "ratio" in samples[0]:  # val extras for box scale-back (host-side)
        out["ratio"] = np.array([x["ratio"] for x in samples], np.float32)
        out["pad"] = np.array([x["pad"] for x in samples], np.float32)
        out["orig_shape"] = np.array([x["orig_shape"] for x in samples], np.int32)
    return out


def polygon2mask(imgsz: tuple[int, int], polygons, color: int = 1,
                 downsample_ratio: int = 1) -> np.ndarray:
    """Rasterize polygons into one (H/r, W/r) mask (reference
    data/utils.py:295)."""
    mask = np.zeros(imgsz, np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).astype(np.int32) for p in polygons]
    cv2.fillPoly(mask, pts, color)
    if downsample_ratio > 1:
        mask = cv2.resize(mask, (imgsz[1] // downsample_ratio, imgsz[0] // downsample_ratio))
    return mask


def polygons2masks(imgsz: tuple[int, int], polygons, color: int = 1,
                   downsample_ratio: int = 1) -> np.ndarray:
    """One mask per polygon, stacked (N, H/r, W/r) (reference
    data/utils.py:319)."""
    return np.stack([
        polygon2mask(imgsz, [p], color, downsample_ratio) for p in polygons
    ]) if len(polygons) else np.zeros((0, imgsz[0] // downsample_ratio,
                                       imgsz[1] // downsample_ratio), np.uint8)


def polygons2masks_overlap(imgsz: tuple[int, int], segments,
                           downsample_ratio: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Single (H/r, W/r) index mask where every pixel belongs to exactly one
    instance (1-based), larger instances drawn first so smaller ones win
    overlaps; returns (mask, area-descending order) (reference
    data/utils.py:337)."""
    h, w = imgsz[0] // downsample_ratio, imgsz[1] // downsample_ratio
    masks = np.zeros((h, w), np.uint8 if len(segments) <= 255 else np.int32)
    areas, ms = [], []
    for seg in segments:
        m = polygon2mask(imgsz, [seg], color=1, downsample_ratio=downsample_ratio)
        ms.append(m)
        areas.append(m.sum())
    order = np.argsort(-np.asarray(areas)) if areas else np.zeros(0, np.int64)
    for rank, idx in enumerate(order):
        masks = np.where(ms[idx] > 0, rank + 1, masks)
    return masks, order
