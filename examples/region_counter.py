"""Count objects per polygonal region over a video stream.

Deploy-example analog of the reference's examples/YOLOv8-Region-Counter
(yolov8_region_counter.py): movable-region GUI is replaced by CLI-specified
polygons (no GUI in this environment); counting itself rides the framework's
RegionCounter solution.

Usage:
    python region_counter.py --source video.mp4 --model yolo11n.yaml \
        --region "name=door; 100,100 300,100 300,300 100,300" \
        --region "name=till; 400,50 600,50 600,250 400,250" --out-dir out/
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_region(spec: str) -> tuple[str, list[tuple[float, float]]]:
    """'name=door; 100,100 300,100 ...' -> ("door", [(100,100), ...])."""
    name = "region"
    if "=" in spec.split(";")[0]:
        head, spec = spec.split(";", 1)
        name = head.split("=", 1)[1].strip()
    pts = [tuple(float(v) for v in p.split(",")) for p in spec.split()]
    assert len(pts) >= 3, f"region needs >=3 points, got {spec!r}"
    return name, pts


def main() -> None:
    import cv2

    from fce_yolo_tpu.solutions import RegionCounter

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--model", default="yolo11n.yaml")
    ap.add_argument("--region", action="append", required=True,
                    help="'name=N; x,y x,y x,y ...' (repeatable)")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--classes", type=int, nargs="*", default=None)
    ap.add_argument("--out-dir", default="region_out")
    ap.add_argument("--save-frames", action="store_true")
    args = ap.parse_args()

    regions = dict(parse_region(s) for s in args.region)
    counter = RegionCounter(model=args.model, regions=regions,
                            conf=args.conf, classes=args.classes)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for i, r in enumerate(counter(args.source)):
        print(f"frame {i}: {r.region_counts}")
        if args.save_frames and r.plot_im is not None:
            cv2.imwrite(str(out_dir / f"{i:06d}.jpg"), r.plot_im)
    print(f"done; totals: {r.region_counts}")


if __name__ == "__main__":
    main()
