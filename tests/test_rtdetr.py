"""RT-DETR family tests: build, forward shapes, weight-import parity vs the
torch reference RTDETRDetectionModel (nn/tasks.py:688-822), and the
deformable-attention math (MSDeformAttn vs reference grid_sample version).
"""

import contextlib
import io
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
CFG = os.path.join(os.path.dirname(__file__), "..", "fce_yolo_tpu", "cfg", "models")


def test_rtdetr_builds_and_forwards():
    from fce_yolo_tpu.nn.model import build_model

    model, spec, strides = build_model(os.path.join(CFG, "rtdetr-l.yaml"), scale="l", nc=5)
    assert spec.task == "rtdetr"
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=True))
    out = jax.eval_shape(lambda vv: model.apply(vv, x, train=False), v)
    assert out["preds"].shape[0] == 2 and out["preds"].shape[-1] == 4 + 5
    tr, _ = jax.eval_shape(lambda vv: model.apply(vv, x, train=True, mutable=["batch_stats"]), v)
    assert tr["dec_bboxes"].shape[0] == 6  # per-layer aux outputs
    assert tr["dec_scores"].shape[-1] == 5


@pytest.mark.parity
@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")), reason="no reference")
class TestRTDETRParity:
    @pytest.fixture(scope="class")
    def ref_pkg(self):
        import importlib.metadata as md
        import types

        orig = md.version

        def fake_version(name, *a, **k):
            try:
                return orig(name)
            except Exception:
                return "0.23.0"

        md.version = fake_version
        if "torchvision" not in sys.modules:  # ultralytics.models pulls SAM
            tv = types.ModuleType("torchvision")
            import importlib.machinery as _ilm
            tv.__spec__ = _ilm.ModuleSpec("torchvision", None)
            tv.__version__ = "0.23.0"
            tv.ops = types.ModuleType("torchvision.ops")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = tv.ops
        sys.path.insert(0, REF)
        yield
        sys.path.remove(REF)

    def test_msdeform_attn_parity(self, ref_pkg):
        """Our gather-based bilinear sampling == reference grid_sample."""
        import torch
        from ultralytics.nn.modules.transformer import MSDeformAttn as TorchMSDA

        from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
        from fce_yolo_tpu.nn.transformer import MSDeformAttn

        torch.manual_seed(0)
        d_model, nl, nh, npts = 64, 3, 4, 4
        tm = TorchMSDA(d_model, nl, nh, npts).eval().float()
        # randomize the zero-init projections so the test has signal
        with torch.no_grad():
            tm.sampling_offsets.weight.uniform_(-0.05, 0.05)
            tm.attention_weights.weight.uniform_(-0.5, 0.5)

        shapes = [(8, 8), (4, 4), (2, 2)]
        lv = sum(h * w for h, w in shapes)
        rng = np.random.RandomState(1)
        b, nq = 2, 7
        query = rng.randn(b, nq, d_model).astype(np.float32)
        value = rng.randn(b, lv, d_model).astype(np.float32)
        refer = rng.uniform(0.1, 0.9, (b, nq, 1, 4)).astype(np.float32)
        refer_b = np.broadcast_to(refer, (b, nq, nl, 4)).copy()

        with torch.no_grad():
            ty = tm(
                torch.from_numpy(query), torch.from_numpy(refer_b),
                torch.from_numpy(value), [list(s) for s in shapes],
            ).numpy()

        m = MSDeformAttn(d_model, nl, nh, npts)
        # rename torch keys into the flax tree (module scope-less here)
        sd = {k: v for k, v in tm.state_dict().items()}
        template = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.asarray(query),
                           jnp.asarray(refer), jnp.asarray(value), shapes)
        )
        variables = state_dict_to_variables(sd, template=template)
        ours = np.asarray(m.apply(variables, jnp.asarray(query), jnp.asarray(refer),
                                  jnp.asarray(value), shapes))
        np.testing.assert_allclose(ours, ty, rtol=1e-4, atol=1e-5)

    def test_rtdetr_import_forward_parity(self, ref_pkg):
        """Full rtdetr-l graph: imported torch weights reproduce eval preds."""
        import yaml as pyyaml

        import torch
        from ultralytics.nn.tasks import RTDETRDetectionModel

        from fce_yolo_tpu.nn.import_torch import state_dict_to_variables
        from fce_yolo_tpu.nn.model import build_model

        d = pyyaml.safe_load(open(os.path.join(REF, "ultralytics/cfg/models/rt-detr/rtdetr-l.yaml")))
        d["nc"] = 8
        torch.manual_seed(2)
        with contextlib.redirect_stdout(io.StringIO()):
            tm = RTDETRDetectionModel(d, verbose=False)
        tm.eval().float()
        # give the zero-init heads signal so outputs aren't degenerate
        head = tm.model[-1]
        with torch.no_grad():
            head.enc_bbox_head.layers[-1].weight.uniform_(-0.05, 0.05)
            for reg in head.dec_bbox_head:
                reg.layers[-1].weight.uniform_(-0.05, 0.05)
            for msda in [la.cross_attn for la in head.decoder.layers]:
                msda.sampling_offsets.weight.uniform_(-0.02, 0.02)
                msda.attention_weights.weight.uniform_(-0.2, 0.2)

        model, spec, strides = build_model(os.path.join(CFG, "rtdetr-l.yaml"), scale="l", nc=8)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=True)
        )
        variables = state_dict_to_variables(tm.state_dict(), template=template)

        rng = np.random.RandomState(0)
        x = rng.rand(1, 160, 160, 3).astype(np.float32)
        with torch.no_grad():
            ty, _ = tm.predict(torch.from_numpy(x.transpose(0, 3, 1, 2)))  # (B, nq, 4+nc)
        ty = ty.numpy()
        ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False)["preds"])
        assert ours.shape == tuple(ty.shape)
        # The 300-query selection tops near-tied encoder scores (random-init
        # model): float noise reorders tail queries between torch.topk and
        # lax.top_k. Compare the confident HEAD as a set: every ref top-100
        # row (by conf) must have a matching ours row.
        rconf = ty[0, :, 4:].max(-1)
        oconf = ours[0, :, 4:].max(-1)
        order = np.argsort(-rconf)[:100]
        used = np.zeros(ours.shape[1], bool)
        unmatched = 0
        for ri in order:
            row = ty[0, ri]
            cand = np.where(
                ~used
                & (np.abs(ours[0, :, :4] - row[:4]).max(-1) < 1e-2)
                & (np.abs(ours[0, :, 4:] - row[4:]).max(-1) < 5e-3)
            )[0]
            if len(cand):
                used[cand[0]] = True
            else:
                unmatched += 1
        # a few tail queries may flip in/out of the 300-query selection on
        # near-tied encoder scores (measured: 96/100 rows match at 1e-4;
        # the flipped ones sit one grid cell away with scores within 5e-4)
        assert unmatched <= 5, f"{unmatched}/100 top ref rows unmatched"
        # and the confident-score distributions agree globally
        np.testing.assert_allclose(
            np.sort(oconf)[-50:], np.sort(rconf)[-50:], rtol=2e-3, atol=1e-3
        )


def test_detr_loss_unit():
    """Loss is finite, positive, and gradients flow (no reference needed)."""
    from fce_yolo_tpu.train.detr_loss import DETRLossCfg, detr_loss
    from fce_yolo_tpu.train.loss import LossState

    rng = np.random.RandomState(0)
    L, B, NQ, NC, M = 3, 2, 50, 7, 6
    out = {
        "dec_bboxes": jnp.asarray(rng.uniform(0.2, 0.8, (L, B, NQ, 4)).astype(np.float32)),
        "dec_scores": jnp.asarray(rng.randn(L, B, NQ, NC).astype(np.float32)),
        "enc_bboxes": jnp.asarray(rng.uniform(0.2, 0.8, (B, NQ, 4)).astype(np.float32)),
        "enc_scores": jnp.asarray(rng.randn(B, NQ, NC).astype(np.float32)),
    }
    mask = np.zeros((B, M), bool)
    mask[0, :4] = True
    mask[1, :2] = True
    batch = {
        "cls": jnp.asarray(rng.randint(0, NC, (B, M)).astype(np.float32) * mask),
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32) * mask[..., None]),
        "mask": jnp.asarray(mask),
    }
    cfg = DETRLossCfg(nc=NC)

    def f(out):
        total, parts, _ = detr_loss(out, batch, cfg, LossState.init())
        return total

    total, parts, _ = detr_loss(out, batch, cfg, LossState.init())
    assert np.isfinite(float(total)) and float(total) > 0
    g = jax.grad(lambda o: f(o))({k: v for k, v in out.items()})
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parity
@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")), reason="no reference")
def test_detr_loss_golden():
    """Same synthetic predictions + gts -> same (class, bbox, giou) triple as
    the reference RTDETRDetectionLoss (no denoising)."""
    import importlib.metadata as md
    import types

    orig = md.version

    def _try(n):
        try:
            return orig(n)
        except Exception:
            return "0.23.0"

    md.version = _try
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        import importlib.machinery as _ilm
        tv.__spec__ = _ilm.ModuleSpec("torchvision", None)
        tv.__version__ = "0.23.0"
        tv.ops = types.ModuleType("torchvision.ops")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
    sys.path.insert(0, REF)
    try:
        import torch
        from ultralytics.models.utils.loss import RTDETRDetectionLoss

        from fce_yolo_tpu.train.detr_loss import DETRLossCfg, detr_loss
        from fce_yolo_tpu.train.loss import LossState

        rng = np.random.RandomState(3)
        L, B, NQ, NC = 4, 2, 60, 5  # L includes the enc layer
        bboxes = rng.uniform(0.15, 0.85, (L, B, NQ, 4)).astype(np.float32)
        scores = rng.randn(L, B, NQ, NC).astype(np.float32)
        n_gt = [3, 2]
        gt_cls_flat, gt_box_flat, batch_idx = [], [], []
        for i, n in enumerate(n_gt):
            gt_cls_flat += list(rng.randint(0, NC, n))
            gt_box_flat += list(rng.uniform(0.3, 0.6, (n, 4)))
            batch_idx += [i] * n
        targets = {
            "cls": torch.tensor(gt_cls_flat, dtype=torch.long),
            "bboxes": torch.tensor(np.array(gt_box_flat), dtype=torch.float32),
            "batch_idx": torch.tensor(batch_idx, dtype=torch.long),
            "gt_groups": n_gt,
        }
        crit = RTDETRDetectionLoss(nc=NC, use_vfl=True)
        tl = crit(
            (torch.from_numpy(bboxes[1:]), torch.from_numpy(scores[1:])),
            targets,
        )
        # emulate tasks.py: enc layer is element 0 of the stack
        tl_full = crit(
            (torch.from_numpy(bboxes), torch.from_numpy(scores)), targets
        )

        M = 4
        cls_p = np.zeros((B, M), np.float32)
        box_p = np.zeros((B, M, 4), np.float32)
        mask_p = np.zeros((B, M), bool)
        o = 0
        for i, n in enumerate(n_gt):
            cls_p[i, :n] = gt_cls_flat[o : o + n]
            box_p[i, :n] = gt_box_flat[o : o + n]
            mask_p[i, :n] = True
            o += n
        out = {
            "dec_bboxes": jnp.asarray(bboxes[1:]),
            "dec_scores": jnp.asarray(scores[1:]),
            "enc_bboxes": jnp.asarray(bboxes[0]),
            "enc_scores": jnp.asarray(scores[0]),
        }
        batch = {"cls": jnp.asarray(cls_p), "bboxes": jnp.asarray(box_p), "mask": jnp.asarray(mask_p)}
        total, parts, _ = detr_loss(out, batch, DETRLossCfg(nc=NC), LossState.init())

        np.testing.assert_allclose(float(parts["cls"]), float(tl_full["loss_class"]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(parts["box"]), float(tl_full["loss_bbox"]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(parts["giou"]), float(tl_full["loss_giou"]), rtol=1e-4, atol=1e-5)
        aux_ref = float(tl_full["loss_class_aux"] + tl_full["loss_bbox_aux"] + tl_full["loss_giou_aux"])
        np.testing.assert_allclose(float(parts["aux"]), aux_ref, rtol=1e-4, atol=1e-5)
        ref_total = float(sum(v for v in tl_full.values()))
        np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)
    finally:
        sys.path.remove(REF)


@pytest.mark.slow
def test_rtdetr_tiny_train_loop():
    """E2E: tiny RT-DETR graph + detr_loss + optimizer overfits a fixed batch
    (loss decreases)."""
    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.train.detr_loss import DETRLossCfg, detr_loss
    from fce_yolo_tpu.train.loss import DetectionLossCfg
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    cfg_d = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],   # P3/8
            [-1, 1, "Conv", [48, 3, 2]],   # P4/16
            [-1, 1, "Conv", [64, 3, 2]],   # P5/32
        ],
        "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 64, 40, 2]]],
    }
    model, spec, strides = build_model(cfg_d, nc=3)
    assert spec.task == "rtdetr"
    variables = init_variables(model, jax.random.PRNGKey(0), imgsz=128)

    detr_cfg = DETRLossCfg(nc=3)
    task_loss = lambda out, batch, cfg, state: detr_loss(out, batch, detr_cfg, state)
    ocfg = OptimCfg(optimizer="AdamW", lr0=2e-4, warmup_epochs=0, batch_size=2, nbs=2)
    tx = build_optimizer(ocfg, variables["params"])
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx, DetectionLossCfg(nc=3), task_loss=task_loss))

    rng = np.random.RandomState(0)
    img = np.full((2, 128, 128, 3), 40, np.uint8)
    img[0, 30:70, 20:80] = 200
    img[1, 60:110, 50:100] = 180
    batch = {
        "img": jnp.asarray(img),
        "cls": jnp.asarray(np.array([[0, 0], [1, 0]], np.float32)),
        "bboxes": jnp.asarray(
            np.array(
                [[[0.39, 0.39, 0.47, 0.31], [0, 0, 0, 0]],
                 [[0.58, 0.66, 0.39, 0.39], [0, 0, 0, 0]]], np.float32)
        ),
        "mask": jnp.asarray(np.array([[True, False], [True, False]])),
    }
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_cdn_group_structure():
    """make_cdn_group static layout: positives first, identity match, masked
    pads, attention chunks isolated (reference get_cdn_group ops.py:188-315)."""
    from fce_yolo_tpu.train.detr_loss import make_cdn_group

    b, m, nc, nq = 2, 3, 5, 7
    cls = np.array([[0, 1, 2], [3, 4, 0]], np.int32)
    box = np.clip(np.random.RandomState(0).rand(b, m, 4) * 0.5 + 0.25, 0, 1)
    mask = np.array([[True, True, False], [True, False, False]])
    g = make_cdn_group(cls, box, mask, nc=nc, nq=nq, num_dn=12, rng=0)
    gr = g["num_group"]
    nd = 2 * gr * m
    assert gr == 4 and g["dn_cls"].shape == (b, nd)
    # padded slots carry the -1 sentinel and 0.0 raw boxes in EVERY copy
    for i in range(2 * gr):
        blk = slice(i * m, (i + 1) * m)
        assert (g["dn_cls"][:, blk][~mask] == -1).all()
        assert (g["dn_bbox"][:, blk][~mask] == 0.0).all()
    # class noise flips at most the configured ratio; unflipped slots keep gt
    pos = g["dn_cls"][:, : gr * m].reshape(b, gr, m)
    same = (pos == cls[:, None, :]) | ~mask[:, None, :]
    assert same.mean() > 0.5  # cls_noise_ratio*0.5 = 0.25 expected flip rate
    am = g["dn_attn_mask"]
    assert am.shape == (nd + nq, nd + nq)
    # match queries never see dn queries
    assert am[nd:, :nd].all() and not am[nd:, nd:].any()
    # each 2M dn chunk sees itself + the match queries, nothing else
    for i in range(gr):
        s, e = 2 * m * i, 2 * m * (i + 1)
        assert not am[s:e, s:e].any() and not am[s:e, nd:].any()
        other = np.ones(nd, bool)
        other[s:e] = False
        assert am[s:e, :nd][:, other].all()


@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")), reason="no reference")
def test_cdn_attn_mask_parity_vs_reference():
    """The static attention mask matches the reference get_cdn_group mask
    exactly when every image carries max_nums gts (the dense case where the
    reference's dynamic stride equals our static M)."""
    import torch

    sys.path.insert(0, REF)
    try:
        from ultralytics.models.utils.ops import get_cdn_group
    finally:
        sys.path.remove(REF)

    from fce_yolo_tpu.train.detr_loss import make_cdn_group

    b, m, nc, nq = 2, 3, 5, 7
    batch = {
        "cls": torch.arange(b * m) % nc,
        "bboxes": torch.rand(b * m, 4) * 0.5 + 0.25,
        "batch_idx": torch.arange(b * m) // m,
        "gt_groups": [m] * b,
    }
    _, _, ref_mask, meta = get_cdn_group(
        batch, nc, nq, torch.zeros(nc, 8), num_dn=12, training=True
    )
    ours = make_cdn_group(
        np.zeros((b, m), np.int32), np.full((b, m, 4), 0.5, np.float32),
        np.ones((b, m), bool), nc=nc, nq=nq, num_dn=12, rng=0,
    )
    assert meta["dn_num_group"] == ours["num_group"]
    np.testing.assert_array_equal(ref_mask.numpy(), ours["dn_attn_mask"])
    # reference positive indices == our identity layout (slots [0, G*M))
    for i in range(b):
        np.testing.assert_array_equal(
            np.sort(meta["dn_pos_idx"][i].numpy()), np.arange(meta["dn_num_group"] * m)
        )


def test_rtdetr_cdn_train_step():
    """Tiny RT-DETR trains WITH contrastive-denoising queries: dn loss is
    live (>0), grads stay finite, and total loss decreases."""
    from fce_yolo_tpu.nn.model import build_model, init_variables
    from fce_yolo_tpu.train.detr_loss import DETRLossCfg, detr_loss, make_cdn_group
    from fce_yolo_tpu.train.loss import DetectionLossCfg
    from fce_yolo_tpu.train.optim import OptimCfg, build_optimizer
    from fce_yolo_tpu.train.trainer import create_train_state, make_train_step

    cfg_d = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [48, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "RTDETRDecoder", ["nc", 64, 40, 2]]],
    }
    model, spec, strides = build_model(cfg_d, nc=3)
    variables = init_variables(model, jax.random.PRNGKey(0), imgsz=128)

    detr_cfg = DETRLossCfg(nc=3)
    task_loss = lambda out, batch, cfg, state: detr_loss(out, batch, detr_cfg, state)
    ocfg = OptimCfg(optimizer="AdamW", lr0=2e-4, warmup_epochs=0, batch_size=2, nbs=2)
    tx = build_optimizer(ocfg, variables["params"])
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx, DetectionLossCfg(nc=3), task_loss=task_loss))

    img = np.full((2, 128, 128, 3), 40, np.uint8)
    img[0, 30:70, 20:80] = 200
    img[1, 60:110, 50:100] = 180
    cls = np.array([[0, 0], [1, 0]], np.float32)
    box = np.array(
        [[[0.39, 0.39, 0.47, 0.31], [0, 0, 0, 0]],
         [[0.58, 0.66, 0.39, 0.39], [0, 0, 0, 0]]], np.float32)
    mask = np.array([[True, False], [True, False]])
    nq_eff = min(40, sum((128 // s) ** 2 for s in strides))
    losses, dns = [], []
    for i in range(10):
        dn = make_cdn_group(cls, box, mask, nc=3, nq=nq_eff, num_dn=8, rng=i)
        batch = {
            "img": jnp.asarray(img), "cls": jnp.asarray(cls),
            "bboxes": jnp.asarray(box), "mask": jnp.asarray(mask),
            "dn_cls": jnp.asarray(dn["dn_cls"]),
            "dn_bbox": jnp.asarray(dn["dn_bbox"]),
            "dn_attn_mask": jnp.asarray(dn["dn_attn_mask"]),
        }
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        dns.append(float(m["dn"]))
    assert np.isfinite(losses).all()
    assert all(d > 0 for d in dns), dns
    assert losses[-1] < losses[0], (losses[0], losses[-1])
