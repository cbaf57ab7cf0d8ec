"""Vectorized label containers: ``Bboxes`` and ``Instances``.

Public-API analog of the reference's ``utils/instance.py`` (Bboxes:35,
Instances:181): numpy containers bundling an image's boxes, polygon
segments and keypoints so geometric edits (scale / pad / flip / clip /
normalize) stay consistent across all three.

Internally the augmentation pipeline here is pure-function over plain
arrays (``data/augment.py``) — these containers exist for users and
downstream code that manipulate labels directly. Design differs from the
reference: format conversion goes through a (src, dst) dispatch table over
the shared ``ops.boxes`` converters, and every geometric update funnels
through two per-axis closures (``_map_x`` / ``_map_y``) applied uniformly
to boxes, segments and keypoints instead of hand-unrolled per-field blocks.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np

from fce_yolo_tpu.ops.boxes import (
    ltwh2xywh,
    ltwh2xyxy,
    xywh2ltwh,
    xywh2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
)
from fce_yolo_tpu.ops.geometry import resample_segments

__all__ = ["Bboxes", "Instances"]

FORMATS = ("xyxy", "xywh", "ltwh")

# (src, dst) -> converter over an (N, 4) array. The shared converters are
# jnp-generic; np.array() forces a WRITABLE numpy copy (np.asarray of a JAX
# array is read-only, which would break later in-place clip/flip edits).
_CONVERT: dict[tuple[str, str], Callable[[np.ndarray], np.ndarray]] = {
    ("xyxy", "xywh"): lambda b: np.array(xyxy2xywh(b)),
    ("xyxy", "ltwh"): lambda b: np.array(xyxy2ltwh(b)),
    ("xywh", "xyxy"): lambda b: np.array(xywh2xyxy(b)),
    ("xywh", "ltwh"): lambda b: np.array(xywh2ltwh(b)),
    ("ltwh", "xyxy"): lambda b: np.array(ltwh2xyxy(b)),
    ("ltwh", "xywh"): lambda b: np.array(ltwh2xywh(b)),
}


def _quad(v: float | Sequence[float]) -> tuple[float, float, float, float]:
    """Broadcast a scalar to 4 coords; validate explicit 4-tuples."""
    if isinstance(v, Iterable) and not isinstance(v, (str, bytes)):
        v = tuple(v)
        assert len(v) == 4, f"expected 4 per-coordinate values, got {len(v)}"
        return v
    return (v, v, v, v)


class Bboxes:
    """(N, 4) boxes in one of 'xyxy' | 'xywh' | 'ltwh', with conversion,
    area, scale/offset and concatenation. No normalization state — that
    lives on :class:`Instances`."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy") -> None:
        assert format in FORMATS, f"invalid box format {format!r}, pick from {FORMATS}"
        bboxes = np.asarray(bboxes)
        if bboxes.ndim == 1:
            bboxes = bboxes.reshape(-1, 4) if bboxes.size else bboxes.reshape(0, 4)
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4, f"bad box shape {bboxes.shape}"
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str) -> None:
        """In-place format conversion via the dispatch table."""
        assert format in FORMATS, f"invalid box format {format!r}, pick from {FORMATS}"
        if format != self.format:
            self.bboxes = _CONVERT[self.format, format](self.bboxes)
            self.format = format

    def areas(self) -> np.ndarray:
        w, h = (
            (self.bboxes[:, 2] - self.bboxes[:, 0], self.bboxes[:, 3] - self.bboxes[:, 1])
            if self.format == "xyxy"
            else (self.bboxes[:, 2], self.bboxes[:, 3])  # xywh / ltwh store w,h directly
        )
        return w * h

    def mul(self, scale: float | Sequence[float]) -> None:
        """Per-coordinate multiply (scalar broadcasts to all four)."""
        self.bboxes = self.bboxes * np.asarray(_quad(scale))

    def add(self, offset: float | Sequence[float]) -> None:
        """Per-coordinate offset (scalar broadcasts to all four)."""
        self.bboxes = self.bboxes + np.asarray(_quad(offset))

    def __len__(self) -> int:
        return len(self.bboxes)

    def __getitem__(self, index) -> "Bboxes":
        b = self.bboxes[index]
        b = b.reshape(1, -1) if b.ndim == 1 else b
        assert b.ndim == 2, f"indexing Bboxes with {index!r} did not return a matrix"
        return Bboxes(b, format=self.format)

    @classmethod
    def concatenate(cls, boxes_list: Sequence["Bboxes"], axis: int = 0) -> "Bboxes":
        assert isinstance(boxes_list, (list, tuple))
        if not boxes_list:
            return cls(np.empty((0, 4)))
        assert all(isinstance(b, Bboxes) for b in boxes_list)
        if len(boxes_list) == 1:
            return boxes_list[0]
        return cls(
            np.concatenate([b.bboxes for b in boxes_list], axis=axis),
            format=boxes_list[0].format,
        )


class Instances:
    """Boxes + segments + keypoints of one image, edited in lockstep.

    Arrays: boxes (N, 4); segments (N, M, 2) — resampled polygons;
    keypoints (N, K, 3) as (x, y, visible) or None. ``normalized`` tracks
    whether coordinates are fractions of image size.
    """

    def __init__(
        self,
        bboxes: np.ndarray,
        segments: np.ndarray | None = None,
        keypoints: np.ndarray | None = None,
        bbox_format: str = "xywh",
        normalized: bool = True,
    ) -> None:
        self._bboxes = Bboxes(bboxes, format=bbox_format)
        self.segments = (
            np.zeros((len(self._bboxes), 0, 2), dtype=np.float32) if segments is None else segments
        )
        self.keypoints = keypoints
        self.normalized = normalized

    # -- uniform geometric edits -------------------------------------------
    def _map_axes(
        self,
        fx: Callable[[np.ndarray], np.ndarray],
        fy: Callable[[np.ndarray], np.ndarray],
        skip_points: bool = False,
    ) -> None:
        """Apply per-axis maps to segments and keypoint xy. Box handling is
        format-specific and stays with each caller (a flip is not per-coord
        monotone on xyxy)."""
        if skip_points:
            return
        if self.segments.size:
            self.segments[..., 0] = fx(self.segments[..., 0])
            self.segments[..., 1] = fy(self.segments[..., 1])
        if self.keypoints is not None:
            self.keypoints[..., 0] = fx(self.keypoints[..., 0])
            self.keypoints[..., 1] = fy(self.keypoints[..., 1])

    def convert_bbox(self, format: str) -> None:
        self._bboxes.convert(format)

    @property
    def bbox_areas(self) -> np.ndarray:
        return self._bboxes.areas()

    def scale(self, scale_w: float, scale_h: float, bbox_only: bool = False) -> None:
        """Multiply all x by scale_w and all y by scale_h."""
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        self._map_axes(lambda x: x * scale_w, lambda y: y * scale_h, skip_points=bbox_only)

    def denormalize(self, w: int, h: int) -> None:
        """Fractions -> pixels; no-op when already absolute."""
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w: int, h: int) -> None:
        """Pixels -> fractions; no-op when already normalized."""
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw: int, padh: int) -> None:
        """Shift all coordinates by a (letterbox) pad. Absolute coords only."""
        assert not self.normalized, "padding requires absolute coordinates"
        self._bboxes.add((padw, padh, padw, padh))
        self._map_axes(lambda x: x + padw, lambda y: y + padh)

    def _flip(self, size: float, axis: int) -> None:
        """Mirror coordinate `axis` (0=x, 1=y) around an image dimension."""
        b, fmt = self.bboxes, self._bboxes.format
        if fmt == "xyxy":  # lo/hi swap under mirroring
            lo, hi = b[:, axis].copy(), b[:, axis + 2].copy()
            b[:, axis], b[:, axis + 2] = size - hi, size - lo
        else:  # xywh/ltwh: only the position coord mirrors
            b[:, axis] = size - b[:, axis]
        flip = lambda v: size - v
        ident = lambda v: v
        self._map_axes(flip if axis == 0 else ident, flip if axis == 1 else ident)

    def fliplr(self, w: int) -> None:
        """Mirror horizontally around image width."""
        self._flip(w, axis=0)

    def flipud(self, h: int) -> None:
        """Mirror vertically around image height."""
        self._flip(h, axis=1)

    def clip(self, w: int, h: int) -> None:
        """Clamp everything into [0, w] x [0, h]; keypoints leaving the
        image get visibility zeroed first (reference clip semantics)."""
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self.bboxes
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)
        if self.keypoints is not None:
            kx, ky = self.keypoints[..., 0], self.keypoints[..., 1]
            self.keypoints[..., 2][(kx < 0) | (kx > w) | (ky < 0) | (ky > h)] = 0.0
        self._map_axes(lambda x: x.clip(0, w), lambda y: y.clip(0, h))

    def remove_zero_area_boxes(self) -> np.ndarray:
        """Drop boxes clipped to zero width/height; returns the keep mask."""
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if len(self.segments):
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def update(self, bboxes: np.ndarray, segments: np.ndarray | None = None,
               keypoints: np.ndarray | None = None) -> None:
        """Replace arrays in place, keeping the current box format."""
        self._bboxes = Bboxes(bboxes, format=self._bboxes.format)
        if segments is not None:
            self.segments = segments
        if keypoints is not None:
            self.keypoints = keypoints

    def __getitem__(self, index) -> "Instances":
        return Instances(
            bboxes=self._bboxes[index].bboxes,
            segments=self.segments[index] if len(self.segments) else self.segments,
            keypoints=self.keypoints[index] if self.keypoints is not None else None,
            bbox_format=self._bboxes.format,
            normalized=self.normalized,
        )

    def __len__(self) -> int:
        return len(self.bboxes)

    @classmethod
    def concatenate(cls, instances_list: Sequence["Instances"], axis: int = 0) -> "Instances":
        """Concatenate, resampling segments to a common point count when
        members disagree (mosaic mixes sources)."""
        assert isinstance(instances_list, (list, tuple))
        if not instances_list:
            return cls(np.empty((0, 4)))
        assert all(isinstance(i, Instances) for i in instances_list)
        if len(instances_list) == 1:
            return instances_list[0]

        first = instances_list[0]
        boxes = np.concatenate([i.bboxes for i in instances_list], axis=axis)
        seg_lens = {i.segments.shape[1] for i in instances_list}
        if len(seg_lens) > 1:
            n = max(seg_lens)
            segments = np.concatenate(
                [
                    np.stack(resample_segments(list(i.segments), n))
                    if len(i.segments)
                    else np.zeros((0, n, 2), dtype=np.float32)
                    for i in instances_list
                ],
                axis=axis,
            )
        else:
            segments = np.concatenate([i.segments for i in instances_list], axis=axis)
        keypoints = (
            np.concatenate([i.keypoints for i in instances_list], axis=axis)
            if first.keypoints is not None
            else None
        )
        return cls(boxes, segments, keypoints, first._bboxes.format, first.normalized)

    @property
    def bboxes(self) -> np.ndarray:
        return self._bboxes.bboxes
