"""Unicode-safe OpenCV IO (reference utils/patches.py:14-70).

cv2.imread/imwrite fail silently on non-ASCII paths on several platforms;
the fork's user base works with CJK paths. These wrappers round-trip through
numpy buffers (cv2.imdecode / cv2.imencode), which are encoding-agnostic.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

__all__ = ["imread", "imwrite"]


def imread(filename: str | Path, flags: int = cv2.IMREAD_COLOR) -> np.ndarray | None:
    """Unicode-safe cv2.imread (reference patches.py:14)."""
    try:
        buf = np.fromfile(str(filename), np.uint8)
    except OSError:
        return None
    if buf.size == 0:
        return None
    return cv2.imdecode(buf, flags)


def imwrite(filename: str | Path, img: np.ndarray, params=None) -> bool:
    """Unicode-safe cv2.imwrite (reference patches.py:44)."""
    try:
        ok, buf = cv2.imencode(Path(filename).suffix or ".jpg", img, params or [])
        if not ok:
            return False
        buf.tofile(str(filename))
        return True
    except (OSError, cv2.error):
        return False
