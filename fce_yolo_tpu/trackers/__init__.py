"""Multi-object trackers: ByteTrack + BoT-SORT (pure numpy, host-side).

Rebuild of the reference trackers/ package (byte_tracker.py:231 BYTETracker,
bot_sort.py:147 BOTSORT, utils/kalman_filter.py, utils/gmc.py).
"""

from fce_yolo_tpu.trackers.bot_sort import BOTSORT, GMC
from fce_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack, TrackerArgs
from fce_yolo_tpu.trackers.kalman import KalmanFilterXYAH
from fce_yolo_tpu.trackers.track import build_tracker, track_stream

__all__ = [
    "BOTSORT",
    "BYTETracker",
    "GMC",
    "KalmanFilterXYAH",
    "STrack",
    "TrackerArgs",
    "build_tracker",
    "track_stream",
]
