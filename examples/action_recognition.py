"""Track-then-classify action recognition over a video stream.

Deploy-example analog of the reference's examples/YOLOv8-Action-Recognition
(action_recognition.py): detect+track people, buffer a short crop sequence
per track id, and label each track with an action. The reference's video
classifiers (TorchVision S3D/R3D/MViT, HuggingFace VideoMAE/CLIP) need
downloaded pretrained weights; offline, this analog ships a
majority-vote-over-frames classifier driven by any framework classify model,
and transparently upgrades to a HuggingFace zero-shot video classifier when
`transformers` has local weights (pass --hf-model).

Usage:
    python action_recognition.py --source video.mp4 --model yolo11n.yaml \
        --classifier yolo11n-cls.yaml --labels "walking,running,sitting" \
        --out-dir out/ [--seq-len 8] [--crop-margin 0.1]
"""

from __future__ import annotations

import argparse
from collections import defaultdict, deque
from pathlib import Path

import cv2
import numpy as np


class FrameVoteActionClassifier:
    """Per-frame classify model + temporal majority vote over the crop buffer.

    Offline stand-in for the reference's TorchVisionVideoClassifier
    (action_recognition.py:21): same call contract — a list of HWC BGR crops
    in, (label, confidence) out — but no 3D conv weights are required.
    """

    def __init__(self, model: str = "yolo11n-cls.yaml", labels: list[str] | None = None):
        from fce_yolo_tpu import YOLO

        self.model = YOLO(model)
        assert self.model.task == "classify", f"{model} is not a classify config"
        if labels:
            self.model.names = dict(enumerate(labels))

    def __call__(self, crops: list[np.ndarray]) -> tuple[str, float]:
        votes: dict[str, list[float]] = defaultdict(list)
        for crop in crops:
            r = self.model.predict(crop, verbose=False)[0]
            if r.probs is None:
                continue
            votes[r.names[int(r.probs.top1)]].append(float(r.probs.top1conf))
        if not votes:
            return "unknown", 0.0
        label = max(votes, key=lambda k: len(votes[k]))
        return label, float(np.mean(votes[label]))


class HuggingFaceVideoClassifier:
    """Zero-shot video classification via transformers (reference
    action_recognition.py:131 HuggingFaceVideoClassifier). Only usable when
    the named checkpoint is already in the local HF cache (no egress here)."""

    def __init__(self, labels: list[str], model_name: str = "microsoft/xclip-base-patch32"):
        import torch
        from transformers import AutoModel, AutoProcessor

        self.labels = labels
        self.processor = AutoProcessor.from_pretrained(model_name, local_files_only=True)
        self.model = AutoModel.from_pretrained(model_name, local_files_only=True).eval()
        self.torch = torch

    def __call__(self, crops: list[np.ndarray]) -> tuple[str, float]:
        rgb = [cv2.cvtColor(c, cv2.COLOR_BGR2RGB) for c in crops]
        inputs = self.processor(videos=[rgb], text=self.labels, return_tensors="pt", padding=True)
        with self.torch.inference_mode():
            probs = self.model(**inputs).logits_per_video.softmax(-1)[0]
        i = int(probs.argmax())
        return self.labels[i], float(probs[i])


def crop_track(frame: np.ndarray, box: np.ndarray, margin: float) -> np.ndarray:
    """Margin-expanded square-ish crop of a track box (reference crop_and_pad)."""
    h, w = frame.shape[:2]
    x1, y1, x2, y2 = box[:4]
    mx, my = (x2 - x1) * margin, (y2 - y1) * margin
    x1, y1 = max(0, int(x1 - mx)), max(0, int(y1 - my))
    x2, y2 = min(w, int(x2 + mx)), min(h, int(y2 + my))
    return frame[y1:y2, x1:x2]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="video file")
    ap.add_argument("--model", default="yolo11n.yaml", help="detector (person class 0)")
    ap.add_argument("--classifier", default="yolo11n-cls.yaml", help="classify model for voting")
    ap.add_argument("--hf-model", default=None, help="HF checkpoint for zero-shot video cls")
    ap.add_argument("--labels", default=None, help="comma-separated action labels")
    ap.add_argument("--seq-len", type=int, default=8, help="crops buffered per track")
    ap.add_argument("--crop-margin", type=float, default=0.1)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--out-dir", default="runs/action")
    args = ap.parse_args()

    from fce_yolo_tpu import YOLO
    from fce_yolo_tpu.utils.annotator import Annotator, colors

    labels = [s.strip() for s in args.labels.split(",")] if args.labels else None
    if args.hf_model:
        classifier = HuggingFaceVideoClassifier(labels or ["walking", "running"], args.hf_model)
    else:
        classifier = FrameVoteActionClassifier(args.classifier, labels)

    model = YOLO(args.model)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    buffers: dict[int, deque] = defaultdict(lambda: deque(maxlen=args.seq_len))
    actions: dict[int, tuple[str, float]] = {}
    writer = None

    for fi, (result, tracks) in enumerate(
        model.track(args.source, stream=True, conf=args.conf, classes=[0])
    ):
        frame = np.ascontiguousarray(result.orig_img)
        ann = Annotator(frame)
        for t in tracks:
            tid = int(t[4])
            crop = crop_track(frame, t, args.crop_margin)
            if crop.size:
                buffers[tid].append(crop)
            if len(buffers[tid]) == args.seq_len:
                actions[tid] = classifier(list(buffers[tid]))
            label, conf = actions.get(tid, ("...", 0.0))
            ann.box_label(t[:4], f"id{tid} {label} {conf:.2f}", color=colors(tid, True))
        if writer is None:
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            writer = cv2.VideoWriter(str(out_dir / "action.mp4"), fourcc, 30, frame.shape[1::-1])
        writer.write(frame)
    if writer is not None:
        writer.release()
    print(f"done: {len(actions)} tracks labelled -> {out_dir / 'action.mp4'}")


if __name__ == "__main__":
    main()
