"""Open-vocabulary datasets for YOLO-World / YOLOE training.

Analogs of the reference's multimodal data stack:
- ``random_load_text``  — reference ``RandomLoadText`` (data/augment.py:2252)
  as a pure function over one sample.
- ``YOLOMultiModalDataset`` — reference data/dataset.py:311: standard YOLO
  labels + per-sample sampled class texts.
- ``GroundingDataset`` — reference data/dataset.py:407: boxes grounded in
  caption spans from a COCO-style JSON (tokens_positive), classes are
  per-image caption phrases.
- ``YOLOConcatDataset`` — reference data/dataset.py:642: concatenation that
  keeps the collate contract.

TPU-first difference: samples carry a STATIC-shape ``txt_feats``
(max_samples, dim) embedding array (hash text encoder, nn/text_model.py)
so the whole batch text input is one (B, M, D) tensor into a single jitted
train step — the reference tokenizes/encodes per step inside the trainer.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from fce_yolo_tpu.data.dataset import YOLODataset

__all__ = ["random_load_text", "YOLOMultiModalDataset", "GroundingDataset",
           "YOLOConcatDataset", "YOLOVisualPromptDataset"]


def random_load_text(
    sample: dict,
    class_texts: list[list[str]],
    rng: np.random.Generator,
    max_samples: int = 80,
    neg_samples: tuple[int, int] = (80, 100),
    padding: bool = True,
    padding_pool: list[str] | None = None,
    prompt_format: str = "{}",
) -> dict:
    """Sample positive + negative class texts for one sample and remap cls.

    Reference RandomLoadText semantics (augment.py:2252): keep up to
    ``max_samples`` positive classes, add random negatives from the rest,
    drop instances whose class was not sampled, remap cls to positions in
    the sampled list, pick one synonym per class, pad to ``max_samples``.

    Mutates and returns ``sample`` (keys: cls, bboxes, optionally
    segments/keypoints, all co-indexed). Adds ``sample["texts"]``.
    """
    nc = len(class_texts)
    cls = np.asarray(sample["cls"]).astype(int).reshape(-1)
    pos = np.unique(cls).tolist()
    if len(pos) > max_samples:
        pos = rng.permutation(pos)[:max_samples].tolist()

    n_neg = int(rng.integers(neg_samples[0], neg_samples[1] + 1))
    n_neg = min(min(nc, max_samples) - len(pos), n_neg)
    neg_pool = [i for i in range(nc) if i not in pos]
    neg = rng.permutation(neg_pool)[:max(n_neg, 0)].tolist()

    sampled = pos + neg
    new_id = {c: i for i, c in enumerate(sampled)}
    valid = np.array([c in new_id for c in cls.tolist()], bool)
    sample["cls"] = np.array([new_id[c] for c in cls[valid].tolist()], np.float32)
    sample["bboxes"] = np.asarray(sample["bboxes"])[valid]
    for k in ("segments", "keypoints"):
        if k in sample:
            v = sample[k]
            sample[k] = [x for x, ok in zip(v, valid) if ok] if isinstance(v, list) else np.asarray(v)[valid]

    texts = [prompt_format.format(class_texts[c][rng.integers(len(class_texts[c]))]) for c in sampled]
    if padding:
        pool = padding_pool or [""]
        texts += [pool[int(rng.integers(len(pool)))] for _ in range(max_samples - len(texts))]
        assert len(texts) == max_samples
    sample["texts"] = texts
    return sample


class _TextEncodingMixin:
    """Shared text machinery: synonym vocab stats, negative pool, cached
    hash-embedding encoding of per-sample text lists."""

    def _init_text(self, class_texts: list[list[str]], max_samples: int,
                   neg_samples: tuple[int, int], prompt_format: str, text_dim: int):
        from fce_yolo_tpu.nn.text_model import build_text_model

        self.class_texts = class_texts
        self.max_samples = max_samples
        self.neg_samples = neg_samples
        self.prompt_format = prompt_format
        self._encoder = build_text_model(f"hash:{text_dim}")
        self._emb_cache: dict[str, np.ndarray] = {}
        self._neg_pool = self._get_neg_texts(self.category_freq)

    @property
    def category_names(self) -> set[str]:
        """Unique category names incl. '/'-separated synonyms."""
        return {t.strip() for text in self.class_texts for t in text}

    @property
    def category_freq(self) -> dict[str, int]:
        """Instance count per category name over the whole dataset."""
        freq: dict[str, int] = defaultdict(int)
        for lbl, texts in self._iter_label_texts():
            for c in np.asarray(lbl["cls"]).reshape(-1).astype(int):
                for t in texts[c]:
                    freq[t.strip()] += 1
        return dict(freq)

    @staticmethod
    def _get_neg_texts(category_freq: dict[str, int], threshold: int = 100) -> list[str]:
        """Frequent-category names used as PADDING negatives (reference
        _get_neg_texts): threshold clamps to the most frequent class so
        small datasets still yield a pool."""
        if not category_freq:
            return [""]
        threshold = min(max(category_freq.values()), threshold)
        return [k for k, v in category_freq.items() if v >= threshold] or [""]

    def _encode_texts(self, texts: list[str]) -> np.ndarray:
        """(M,) strings -> (M, D) float32 embeddings, memoized per string."""
        missing = [t for t in texts if t not in self._emb_cache]
        if missing:
            emb = self._encoder.encode_text(self._encoder.tokenize(missing))
            for t, e in zip(missing, np.asarray(emb, np.float32)):
                self._emb_cache[t] = e
        return np.stack([self._emb_cache[t] for t in texts], 0)

    def _finalize_text_sample(self, s: dict, per_image_texts: list[list[str]]) -> dict:
        if self.mode == "train":
            s = random_load_text(
                s, per_image_texts, self._rng, max_samples=self.max_samples,
                neg_samples=self.neg_samples, padding=True,
                padding_pool=self._neg_pool, prompt_format=self.prompt_format,
            )
        else:  # val/predict: the fixed class list, padded to the static M
            texts = [self.prompt_format.format(t[0]) for t in per_image_texts]
            texts += [""] * (self.max_samples - len(texts))
            s["texts"] = texts[: self.max_samples]
        s["txt_feats"] = self._encode_texts(s["texts"])
        return s


class YOLOMultiModalDataset(_TextEncodingMixin, YOLODataset):
    """YOLO labels + per-sample class texts (reference dataset.py:311).

    ``names`` values may carry '/'-separated synonyms; training samples one
    synonym per class per sample (RandomLoadText semantics). Every sample
    gains ``texts`` (len max_samples) and ``txt_feats`` (max_samples, D).
    """

    def __init__(self, img_path, names: dict[int, str], max_samples: int | None = None,
                 neg_samples: tuple[int, int] = (80, 100), prompt_format: str = "{}",
                 text_dim: int = 512, **kw):
        kw.setdefault("nc", len(names))
        super().__init__(img_path, **kw)
        class_texts = [str(names[k]).split("/") for k in sorted(names)]
        self._init_text(
            class_texts,
            max_samples=min(len(class_texts), 80) if max_samples is None else max_samples,
            neg_samples=neg_samples, prompt_format=prompt_format, text_dim=text_dim,
        )

    def _iter_label_texts(self):
        for lbl in self.labels:
            yield lbl, self.class_texts

    def __getitem__(self, i: int) -> dict:
        return self._finalize_text_sample(super().__getitem__(i), self.class_texts)


class GroundingDataset(_TextEncodingMixin, YOLODataset):
    """Caption-grounded detection from a COCO-style grounding JSON
    (reference dataset.py:407): each annotation's class is the caption
    phrase spanned by its ``tokens_positive``; class ids are PER-IMAGE.

    Cross-image mixing augmentations are disabled: samples from different
    images have incompatible text vocabularies (the reference pre-merges
    these at the trainer level; here each sample stays self-consistent).
    """

    def __init__(self, img_path: str, json_file: str, task: str = "detect",
                 max_samples: int = 80, neg_samples: tuple[int, int] = (30, 30),
                 prompt_format: str = "{}", text_dim: int = 512, **kw):
        assert task in ("detect", "segment"), "GroundingDataset supports detect/segment only"
        self.json_file = json_file
        im_files, labels, texts = self._parse_grounding_json(Path(img_path), Path(json_file))
        self._grounding_labels = labels
        self._image_texts = texts
        kw.setdefault("nc", max(max_samples, 1))
        super().__init__(im_files, task=task, cache_labels=False, **kw)
        # no mosaic/mixup/cutmix/copy-paste across images (vocab mismatch)
        from dataclasses import replace

        self.mosaic_enabled = False
        self.hyp = replace(self.hyp, mixup=0.0, cutmix=0.0, copy_paste=0.0, mosaic=0.0)
        self._init_text(texts_flat(texts), max_samples=max_samples,
                        neg_samples=neg_samples, prompt_format=prompt_format,
                        text_dim=text_dim)

    @staticmethod
    def _parse_grounding_json(img_dir: Path, json_file: Path):
        """JSON -> (im_files, labels-in-framework-format, per-image texts).

        Boxes arrive COCO ltwh pixels; stored normalized xywh like the
        label-file path. Caption spans become per-image class texts.
        """
        ann = json.loads(json_file.read_text())
        images = {int(im["id"]): im for im in ann["images"]}
        per_img: dict[int, list[dict]] = defaultdict(list)
        for a in ann["annotations"]:
            per_img[int(a["image_id"])].append(a)

        im_files, labels, texts = [], [], []
        for img_id, anns in per_img.items():
            im = images[img_id]
            f = img_dir / im["file_name"]
            if not f.exists():
                continue
            w, h = float(im["width"]), float(im["height"])
            caption = im["caption"]
            cat2id: dict[str, int] = {}
            img_texts: list[list[str]] = []
            cls, xywhn = [], []
            for a in anns:
                if a.get("iscrowd"):
                    continue
                x, y, bw, bh = (float(v) for v in a["bbox"])  # ltwh pixels
                if bw <= 0 or bh <= 0:
                    continue
                phrase = " ".join(
                    caption[t[0]:t[1]] for t in a["tokens_positive"]
                ).lower().strip()
                if not phrase:
                    continue
                if phrase not in cat2id:
                    cat2id[phrase] = len(cat2id)
                    img_texts.append([phrase])
                cls.append(float(cat2id[phrase]))
                xywhn.append([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
            if not cls:
                continue
            im_files.append(str(f))
            labels.append({"cls": np.array(cls, np.float32),
                           "xywhn": np.array(xywhn, np.float32)})
            texts.append(img_texts)
        return im_files, labels, texts

    def _load_labels(self, use_cache: bool) -> list[dict]:
        return self._grounding_labels

    def _iter_label_texts(self):
        for lbl, t in zip(self.labels, self._image_texts):
            yield lbl, t

    def __getitem__(self, i: int) -> dict:
        return self._finalize_text_sample(super().__getitem__(i), self._image_texts[i])


def texts_flat(per_image_texts: list[list[list[str]]]) -> list[list[str]]:
    """Union of every image's phrase lists (for global category stats)."""
    seen, out = set(), []
    for img_texts in per_image_texts:
        for t in img_texts:
            key = tuple(t)
            if key not in seen:
                seen.add(key)
                out.append(t)
    return out or [[""]]


class YOLOVisualPromptDataset(YOLODataset):
    """GT boxes as visual prompts (reference LoadVisualPrompt, augment.py:2156
    + YOLOEVPTrainer): every sample carries a static (nc, H/8, W/8) mask
    stack — channel c is the union of class c's boxes on the P3 grid; absent
    classes stay zero (SAVPE degrades those slots to global pooling)."""

    def __getitem__(self, i: int) -> dict:
        s = super().__getitem__(i)
        h, w = s["img"].shape[:2]
        gh, gw = h // 8, w // 8
        masks = np.zeros((self.nc, gh, gw), np.float32)
        for b, c in zip(np.asarray(s["bboxes"], np.float32),
                        np.asarray(s["cls"]).astype(int)):
            y1, y2 = int(b[1] // 8), int(np.ceil(b[3] / 8))
            x1, x2 = int(b[0] // 8), int(np.ceil(b[2] / 8))
            masks[c, max(y1, 0):min(y2, gh), max(x1, 0):min(x2, gw)] = 1.0
        s["visual_prompts"] = masks
        return s


class YOLOConcatDataset:
    """Concatenate datasets sharing the collate contract (reference
    dataset.py:642 over torch ConcatDataset). Exposes the attributes the
    DataLoader reads (mode, imgsz, set_epoch, __len__/__getitem__)."""

    def __init__(self, datasets: list):
        assert datasets, "need at least one dataset"
        self.datasets = list(datasets)
        modes = {d.mode for d in self.datasets}
        assert len(modes) == 1, f"mixed modes in concat: {modes}"
        self.mode = self.datasets[0].mode
        self.imgsz = self.datasets[0].imgsz
        self._cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._cum[-1])

    def _locate(self, i: int) -> tuple[int, int]:
        if i < 0:
            i += len(self)
        assert 0 <= i < len(self), f"index {i} out of range"
        k = int(np.searchsorted(self._cum, i, side="right"))
        return k, i - (int(self._cum[k - 1]) if k else 0)

    def __getitem__(self, i: int):
        k, j = self._locate(i)
        return self.datasets[k][j]

    def set_epoch(self, epoch: int, **kw) -> None:
        for d in self.datasets:
            d.set_epoch(epoch, **kw)

    @property
    def labels(self) -> list[dict]:
        return [lbl for d in self.datasets for lbl in d.labels]
