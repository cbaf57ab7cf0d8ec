"""Select-and-follow object tracking with a highlighted focus track.

Deploy-example analog of the reference's examples/YOLO-Interactive-Tracking-UI
(interactive_tracker.py): the reference selects a track by mouse click in a
cv2 window; this environment is headless, so selection is a CLI point
(--select x,y — the track whose box contains it on its first appearance) or
an explicit --select-id. The focus track gets a dashed highlight box, a
center-trail polyline and an overhead label; other tracks draw dim. An FPS
overlay and .avi output mirror the reference behaviour.

Usage:
    python interactive_tracker.py --source video.mp4 --model yolo11n.yaml \
        --select 320,240 --out interactive_tracker_output.avi
"""

from __future__ import annotations

import argparse
import time
from collections import deque

import cv2
import numpy as np


def dashed_rect(im: np.ndarray, p1, p2, color, thickness: int = 2, dash: int = 10) -> None:
    """Dashed rectangle (reference draw_tracking_scope analog)."""
    (x1, y1), (x2, y2) = p1, p2
    for xa, ya, xb, yb in ((x1, y1, x2, y1), (x1, y2, x2, y2), (x1, y1, x1, y2), (x2, y1, x2, y2)):
        length = int(np.hypot(xb - xa, yb - ya))
        for s in range(0, length, dash * 2):
            e = min(s + dash, length)
            ax = int(xa + (xb - xa) * s / max(length, 1))
            ay = int(ya + (yb - ya) * s / max(length, 1))
            bx = int(xa + (xb - xa) * e / max(length, 1))
            by = int(ya + (yb - ya) * e / max(length, 1))
            cv2.line(im, (ax, ay), (bx, by), color, thickness, cv2.LINE_AA)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="video file (or webcam index)")
    ap.add_argument("--model", default="yolo11n.yaml")
    ap.add_argument("--tracker", default="bytetrack.yaml")
    ap.add_argument("--select", default=None, help="x,y point choosing the focus track")
    ap.add_argument("--select-id", type=int, default=None, help="focus track id directly")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--iou", type=float, default=0.3)
    ap.add_argument("--trail", type=int, default=30, help="focus-track trail length")
    ap.add_argument("--out", default="interactive_tracker_output.avi")
    ap.add_argument("--show", action="store_true", help="also open a cv2 window (needs display)")
    args = ap.parse_args()

    from fce_yolo_tpu import YOLO
    from fce_yolo_tpu.utils.annotator import Annotator, colors

    model = YOLO(args.model)
    pick = tuple(int(v) for v in args.select.split(",")) if args.select else None
    focus_id = args.select_id
    trail: deque = deque(maxlen=args.trail)
    writer = None
    t_prev = time.perf_counter()

    for result, tracks in model.track(
        args.source, stream=True, tracker=args.tracker, conf=args.conf, iou=args.iou
    ):
        frame = np.ascontiguousarray(result.orig_img)
        ann = Annotator(frame)

        if focus_id is None and pick is not None:
            for t in tracks:  # first box containing the pick point wins
                if t[0] <= pick[0] <= t[2] and t[1] <= pick[1] <= t[3]:
                    focus_id = int(t[4])
                    break

        for t in tracks:
            tid, cls = int(t[4]), int(t[6])
            name = result.names.get(cls, str(cls))
            if tid == focus_id:
                c = (int(t[0]), int(t[1])), (int(t[2]), int(t[3]))
                dashed_rect(frame, *c, color=(0, 255, 255), thickness=ann.lw)
                cx, cy = int((t[0] + t[2]) / 2), int((t[1] + t[3]) / 2)
                trail.append((cx, cy))
                if len(trail) > 1:
                    cv2.polylines(frame, [np.array(trail, np.int32)], False, (0, 255, 255), ann.lw)
                cv2.putText(frame, f"FOCUS id{tid} {name}", (c[0][0], max(c[0][1] - 8, 12)),
                            0, ann.sf, (0, 255, 255), ann.tf, cv2.LINE_AA)
            else:
                ann.box_label(t[:4], f"id{tid} {name} {t[5]:.2f}", color=colors(tid, True))

        now = time.perf_counter()
        fps = 1.0 / max(now - t_prev, 1e-6)
        t_prev = now
        cv2.putText(frame, f"FPS: {fps:.1f}", (10, 25), 0, 0.7, (255, 255, 255), 2, cv2.LINE_AA)

        if writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"MJPG")
            writer = cv2.VideoWriter(args.out, fourcc, 30, frame.shape[1::-1])
        writer.write(frame)
        if args.show:
            cv2.imshow("interactive-tracker", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break

    if writer is not None:
        writer.release()
    print(f"done -> {args.out} (focus id: {focus_id})")


if __name__ == "__main__":
    main()
