"""BoT-SORT tracker: ByteTrack + global (camera) motion compensation.

Rebuild of trackers/bot_sort.py:147 + trackers/utils/gmc.py:339. GMC uses
sparse optical flow (goodFeaturesToTrack + pyramidal LK) to estimate a
partial-affine warp between consecutive frames and applies it to the KF
state of every track before association, which stabilizes tracking under
camera motion. ReID: detection-crop appearance features (from the
detector itself via YOLO.embed — the reference's with_reid model="auto"
mode) fuse into the association cost when with_reid is set.
"""

from __future__ import annotations

import numpy as np

from fce_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack, TrackerArgs

__all__ = ["BOTSORT", "GMC"]


class GMC:
    """Sparse-optical-flow camera-motion estimator (reference utils/gmc.py)."""

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray: np.ndarray | None = None
        self.prev_pts: np.ndarray | None = None

    def apply(self, img: np.ndarray) -> np.ndarray:
        """Return a 2x3 affine warp mapping previous-frame coords to current."""
        import cv2

        H = np.eye(2, 3, dtype=np.float32)
        if self.method in ("none", None):
            return H
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))

        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=200, qualityLevel=0.01, minDistance=7, blockSize=7
        )
        if self.prev_gray is not None and self.prev_pts is not None and len(self.prev_pts) >= 4:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            if nxt is not None:
                ok = status.reshape(-1).astype(bool)
                p0, p1 = self.prev_pts[ok], nxt[ok]
                if len(p0) >= 4:
                    M, _ = cv2.estimateAffinePartial2D(p0, p1, method=cv2.RANSAC)
                    if M is not None:
                        H = M.astype(np.float32)
                        if self.downscale > 1:  # scale translation back up
                            H[0, 2] *= self.downscale
                            H[1, 2] *= self.downscale
        self.prev_gray = gray
        self.prev_pts = pts
        return H

    def reset(self):
        self.prev_gray = None
        self.prev_pts = None


class BOTSORT(BYTETracker):
    def __init__(self, args: TrackerArgs | None = None, frame_rate: int = 30,
                 encoder=None):
        args = args or TrackerArgs(tracker_type="botsort")
        super().__init__(args, frame_rate)
        self.gmc = GMC(method=args.gmc_method)
        # ReID appearance encoder: callable (img, (N,4) xyxy) -> (N, D)
        # features. The reference's "auto" mode wraps the detector itself
        # (bot_sort.py:189); track_stream builds the analog from YOLO.embed.
        self.encoder = encoder if args.with_reid else None

    def init_track(self, boxes, scores, classes, idxs, img=None):
        tracks = super().init_track(boxes, scores, classes, idxs, img)
        if self.encoder is not None and img is not None and len(tracks):
            feats = self.encoder(img, np.asarray(boxes, float).reshape(-1, 4))
            for t, f in zip(tracks, feats):
                t.update_features(f)
        return tracks

    def get_dists(self, tracks, detections) -> np.ndarray:
        """IoU (score-fused) distance, fused with appearance when ReID is on
        (reference BOTSORT.get_dists, bot_sort.py:205): embedding distance is
        gated by spatial proximity and the appearance threshold, then the
        elementwise min of the two costs drives the assignment."""
        from fce_yolo_tpu.trackers.matching import embedding_distance, fuse_score, iou_distance

        dists = iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.args.proximity_thresh)
        if self.args.fuse_score:
            dists = fuse_score(dists, detections)
        if self.encoder is not None:
            emb = embedding_distance(tracks, detections) / 2.0
            emb[emb > (1 - self.args.appearance_thresh)] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    @staticmethod
    def gmc_apply(tracks: list[STrack], warp: np.ndarray):
        """Warp every track's KF mean/covariance by the camera motion
        (reference STrack.multi_gmc)."""
        if not len(tracks):
            return
        R = warp[:2, :2]
        t = warp[:2, 2]
        # state is (cx, cy, a, h, vx, vy, va, vh): rotate (cx,cy) and (vx,vy)
        for tr in tracks:
            m = tr.mean.copy()
            m[:2] = R @ m[:2] + t
            m[4:6] = R @ m[4:6]
            tr.mean = m
            C = tr.covariance.copy()
            T = np.eye(8)
            T[:2, :2] = R
            T[4:6, 4:6] = R
            tr.covariance = T @ C @ T.T

    def reset(self):
        super().reset()
        self.gmc.reset()
