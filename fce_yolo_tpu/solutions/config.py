"""Typed configuration for the vision-app solutions layer (reference
solutions/config.py SolutionConfig).

One dataclass carries every solution knob; ``update`` rejects unknown keys
with the exact error contract the reference documents, so user typos fail
fast instead of silently configuring nothing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

__all__ = ["SolutionConfig"]


@dataclass
class SolutionConfig:
    """Central parameter container for all solutions (reference
    config.py:11-120). Field names and defaults mirror the reference; the
    GUI/CUDA-only fields (show, device, half) are accepted for contract
    compatibility and ignored where the environment has no display/CUDA."""

    source: str | None = None
    model: str | None = None
    classes: list[int] | None = None
    show_conf: bool = True
    show_labels: bool = True
    region: list[tuple[int, int]] | None = None
    colormap: int | None = None          # resolved to a cv2 colormap lazily
    show_in: bool = True
    show_out: bool = True
    up_angle: float = 145.0
    down_angle: int = 90
    kpts: list[int] = field(default_factory=lambda: [6, 8, 10])
    analytics_type: str = "line"
    figsize: tuple[int, int] | None = (12.8, 7.2)
    blur_ratio: float = 0.5
    vision_point: tuple[int, int] = (20, 20)
    crop_dir: str = "cropped-detections"
    json_file: str | None = None
    line_width: int = 2
    records: int = 5
    fps: float = 30.0
    max_hist: int = 5
    meter_per_pixel: float = 0.05
    max_speed: int = 120
    show: bool = False
    iou: float = 0.7
    conf: float = 0.25
    device: str | None = None
    max_det: int = 300
    half: bool = False
    tracker: str = "bytetrack.yaml"
    verbose: bool = True
    data: str = "images"

    def update(self, **kwargs: Any) -> "SolutionConfig":
        """Set known fields; raise ``ValueError`` on any unknown key
        (reference config.py:113-120)."""
        for key, value in kwargs.items():
            if not hasattr(self, key):
                raise ValueError(
                    f"{key} is not a valid solution argument; see "
                    "SolutionConfig for the supported set")
            setattr(self, key, value)
        return self
