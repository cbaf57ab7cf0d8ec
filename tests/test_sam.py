"""SAM family: random-weight activation parity vs the torch reference
(VERDICT r2 next-step #2 — the world/yoloe import-parity pattern applied to
SAM), plus the promptable predict plumbing.

Reference modules: models/sam/modules/{encoders,decoders,transformer}.py.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.parity

if not os.path.isdir(os.path.join(REF, "ultralytics")):
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_sam():
    """Import the reference SAM modules (torchvision shim as in
    test_e2e_map_parity — the models/sam package pulls sam3 which imports
    torchvision at module scope)."""
    import importlib.metadata as md
    import types

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        import importlib.machinery as _ilm
        tv.__spec__ = _ilm.ModuleSpec("torchvision", None)
        tv.__version__ = "0.23.0"
        tv_ops = types.ModuleType("torchvision.ops")
        tv_roi = types.ModuleType("torchvision.ops.roi_align")

        class _RoIAlign:  # only referenced by sam3's decoder at build time
            def __init__(self, *a, **k):
                raise NotImplementedError

        tv_roi.RoIAlign = _RoIAlign
        tv_ops.roi_align = tv_roi
        tv_ops.nms = None
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.roi_align"] = tv_roi
    sys.path.insert(0, REF)
    try:
        from ultralytics.models.sam.modules import decoders, encoders, transformer

        yield {"encoders": encoders, "decoders": decoders, "transformer": transformer}
    finally:
        sys.path.remove(REF)


def _prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def _seeded(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


class TestSAMParity:
    def test_image_encoder_parity(self, ref_sam):
        from fce_yolo_tpu.nn.sam import ImageEncoderViT, sam_state_dict_to_variables

        t_enc = ref_sam["encoders"].ImageEncoderViT(
            img_size=64,
            patch_size=16,
            embed_dim=40,
            depth=3,
            num_heads=2,
            mlp_ratio=2.0,
            out_chans=16,
            use_rel_pos=True,
            window_size=2,
            global_attn_indexes=(1,),
        )
        _seeded(t_enc, 1).eval()
        # the reference forward rescales pos_embed by img_size/1024 (it
        # assumes the stored table is the 1024-px pretrain grid); our table
        # matches the build size here, so pin img_size to skip the rescale
        t_enc.img_size = 1024
        x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = t_enc(torch.from_numpy(x)).numpy()  # (B, 16, 4, 4)

        ours = ImageEncoderViT(
            img_size=64,
            embed_dim=40,
            depth=3,
            num_heads=2,
            mlp_ratio=2.0,
            out_chans=16,
            use_rel_pos=True,
            window_size=2,
            global_attn_indexes=(1,),
            pretrain_img_size=64,
        )
        variables = sam_state_dict_to_variables(_prefix_sd(t_enc, "image_encoder"))
        out = ours.apply(
            {"params": variables["params"]["image_encoder"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-5
        )

    def test_prompt_encoder_parity(self, ref_sam):
        from fce_yolo_tpu.nn.sam import PromptEncoder, sam_state_dict_to_variables

        t_pe = ref_sam["encoders"].PromptEncoder(
            embed_dim=32,
            image_embedding_size=(4, 4),
            input_image_size=(64, 64),
            mask_in_chans=16,
        )
        _seeded(t_pe, 2).eval()
        rng = np.random.RandomState(1)
        pts = rng.uniform(0, 64, (2, 3, 2)).astype(np.float32)
        lab = np.array([[1, 0, -1], [1, 1, 1]], np.float32)
        boxes = np.sort(rng.uniform(0, 64, (2, 1, 4)).astype(np.float32).reshape(2, 1, 2, 2), axis=2)
        masks = rng.rand(2, 1, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref_sparse, ref_dense = t_pe(
                (torch.from_numpy(pts), torch.from_numpy(lab)),
                torch.from_numpy(boxes.reshape(2, 1, 4)),
                torch.from_numpy(masks),
            )
            ref_pe = t_pe.get_dense_pe().numpy()

        ours = PromptEncoder(
            embed_dim=32, input_image_size=(64, 64), image_embedding_size=(4, 4)
        )
        variables = sam_state_dict_to_variables(_prefix_sd(t_pe, "prompt_encoder"))
        params = {"params": variables["params"]["prompt_encoder"]}
        sparse, dense = ours.apply(
            params,
            points=(jnp.asarray(pts), jnp.asarray(lab)),
            boxes=jnp.asarray(boxes.reshape(2, 1, 4)),
            masks=jnp.asarray(masks.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(np.asarray(sparse), ref_sparse.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dense).transpose(0, 3, 1, 2), ref_dense.numpy(), rtol=1e-4, atol=1e-5
        )
        our_pe = ours.apply(params, method=ours.dense_pe)
        np.testing.assert_allclose(
            np.asarray(our_pe).transpose(0, 3, 1, 2), ref_pe, rtol=1e-4, atol=1e-5
        )

    def test_mask_decoder_parity(self, ref_sam):
        from fce_yolo_tpu.nn.sam import MaskDecoder, sam_state_dict_to_variables

        t_dec = ref_sam["decoders"].MaskDecoder(
            transformer_dim=32,
            transformer=ref_sam["transformer"].TwoWayTransformer(
                depth=2, embedding_dim=32, mlp_dim=64, num_heads=2
            ),
            iou_head_hidden_dim=32,
        )
        _seeded(t_dec, 3).eval()
        rng = np.random.RandomState(2)
        img_emb = rng.rand(1, 32, 4, 4).astype(np.float32)
        img_pe = rng.rand(1, 32, 4, 4).astype(np.float32)
        sparse = rng.rand(2, 3, 32).astype(np.float32)
        dense = rng.rand(2, 32, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref_masks, ref_iou = t_dec(
                torch.from_numpy(img_emb),
                torch.from_numpy(img_pe),
                torch.from_numpy(sparse),
                torch.from_numpy(dense),
                multimask_output=True,
            )

        ours = MaskDecoder(
            transformer_dim=32,
            transformer_mlp_dim=64,
            transformer_num_heads=2,
            iou_head_hidden_dim=32,
        )
        variables = sam_state_dict_to_variables(_prefix_sd(t_dec, "mask_decoder"))
        masks, iou = ours.apply(
            {"params": variables["params"]["mask_decoder"]},
            jnp.asarray(img_emb.transpose(0, 2, 3, 1)),
            jnp.asarray(img_pe.transpose(0, 2, 3, 1)),
            jnp.asarray(sparse),
            jnp.asarray(dense.transpose(0, 2, 3, 1)),
            multimask_output=True,
        )
        np.testing.assert_allclose(np.asarray(masks), ref_masks.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(iou), ref_iou.numpy(), rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_sam_b_full_parity(self, ref_sam):
        """Full-architecture SAM-B random-weight parity at 256 px."""
        sys.path.insert(0, REF)
        try:
            from ultralytics.models.sam.build import _build_sam
        finally:
            sys.path.remove(REF)
        t_sam = _build_sam(
            encoder_embed_dim=768,
            encoder_depth=12,
            encoder_num_heads=12,
            encoder_global_attn_indexes=[2, 5, 8, 11],
        )
        t_sam.eval()
        t_sam.set_imgsz((256, 256))
        from fce_yolo_tpu.nn.sam import SAMModel, sam_state_dict_to_variables

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (1, 256, 256, 3)).astype(np.float32)
        pts = np.array([[[100.0, 120.0]]], np.float32)
        lab = np.array([[1.0]], np.float32)

        with torch.no_grad():
            t_in = (
                (torch.from_numpy(img.transpose(0, 3, 1, 2)) - t_sam.pixel_mean)
                / t_sam.pixel_std
            )
            emb = t_sam.image_encoder(t_in)
            sparse, dense = t_sam.prompt_encoder(
                (torch.from_numpy(pts), torch.from_numpy(lab)), None, None
            )
            ref_masks, ref_iou = t_sam.mask_decoder(
                emb,
                t_sam.prompt_encoder.get_dense_pe(),
                sparse,
                dense,
                multimask_output=True,
            )

        ours = SAMModel(img_size=256)
        variables = sam_state_dict_to_variables(t_sam.state_dict())
        masks, iou = ours.apply(
            variables,
            jnp.asarray(img),
            points=(jnp.asarray(pts), jnp.asarray(lab)),
            multimask_output=True,
        )
        np.testing.assert_allclose(
            np.asarray(emb := np.asarray(iou)), ref_iou.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(masks), ref_masks.numpy(), rtol=1e-3, atol=2e-3
        )


class TestTinyViTParity:
    def test_tinyvit_parity(self, ref_sam):
        """TinyViT (Mobile-SAM trunk) random-weight activation parity,
        exercising the pad / no-pad / whole-grid window-attention paths."""
        sys.path.insert(0, REF)
        try:
            from ultralytics.models.sam.modules.tiny_encoder import TinyViT as TTinyViT
        finally:
            sys.path.remove(REF)
        from fce_yolo_tpu.nn.tiny_encoder import TinyViT, tinyvit_state_dict_to_params

        dims, depths = (16, 32, 64, 320), (1, 1, 2, 1)
        heads, wins = (2, 2, 4, 10), (7, 3, 2, 4)
        t_enc = TTinyViT(
            img_size=64,
            embed_dims=list(dims),
            depths=list(depths),
            num_heads=list(heads),
            window_sizes=list(wins),
            drop_path_rate=0.0,
        )
        _seeded(t_enc, 7).eval()
        x = np.random.RandomState(3).rand(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = t_enc(torch.from_numpy(x)).numpy()  # (B, 256, 4, 4)

        ours = TinyViT(embed_dims=dims, depths=depths, num_heads=heads,
                       window_sizes=wins)
        params = tinyvit_state_dict_to_params(t_enc.state_dict())
        out = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-5
        )

    def test_mobile_sam_full_parity(self, ref_sam):
        """Full Mobile-SAM (real TinyViT dims) prompt->mask parity at 256 px."""
        sys.path.insert(0, REF)
        try:
            from ultralytics.models.sam.build import build_mobile_sam
        finally:
            sys.path.remove(REF)
        t_sam = build_mobile_sam(None)
        t_sam.eval()
        t_sam.set_imgsz((256, 256))
        from fce_yolo_tpu.nn.sam import SAMModel, sam_state_dict_to_variables

        rng = np.random.RandomState(5)
        img = rng.randint(0, 255, (1, 256, 256, 3)).astype(np.float32)
        pts = np.array([[[90.0, 140.0]]], np.float32)
        lab = np.array([[1.0]], np.float32)
        with torch.no_grad():
            t_in = (
                (torch.from_numpy(img.transpose(0, 3, 1, 2)) - t_sam.pixel_mean)
                / t_sam.pixel_std
            )
            emb = t_sam.image_encoder(t_in)
            sparse, dense = t_sam.prompt_encoder(
                (torch.from_numpy(pts), torch.from_numpy(lab)), None, None
            )
            ref_masks, ref_iou = t_sam.mask_decoder(
                emb,
                t_sam.prompt_encoder.get_dense_pe(),
                sparse,
                dense,
                multimask_output=True,
            )

        ours = SAMModel(img_size=256, mobile=True)
        variables = sam_state_dict_to_variables(t_sam.state_dict())
        masks, iou = ours.apply(
            variables,
            jnp.asarray(img),
            points=(jnp.asarray(pts), jnp.asarray(lab)),
            multimask_output=True,
        )
        np.testing.assert_allclose(np.asarray(iou), ref_iou.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(masks), ref_masks.numpy(), rtol=1e-3, atol=2e-3)


class TestSAMFacade:
    def test_point_prompt_pipeline(self):
        """e2e: image -> point prompt -> binary mask at original resolution."""
        from fce_yolo_tpu.models.sam import SAM

        sam = SAM(variant="sam_b", img_size=128, _random_init=True)
        img = np.random.RandomState(0).randint(0, 255, (96, 80, 3), np.uint8)
        res = sam.predict(img, points=[[40, 50]], labels=[1])
        assert res.masks.shape[1:] == (96, 80)
        assert res.masks.dtype == bool
        assert res.scores.shape[0] == res.masks.shape[0]

    def test_box_prompt_pipeline(self):
        from fce_yolo_tpu.models.sam import SAM

        sam = SAM(variant="sam_b", img_size=128, _random_init=True)
        img = np.random.RandomState(1).randint(0, 255, (64, 128, 3), np.uint8)
        res = sam.predict(img, bboxes=[[10, 10, 60, 50]])
        assert res.masks.shape[1:] == (64, 128)

    def test_mobile_sam_facade(self):
        """mobile_sam.pt routes to the TinyViT trunk (build.py:319-333)."""
        from fce_yolo_tpu.models.sam import SAM

        sam = SAM(variant="mobile_sam", img_size=128, _random_init=True)
        img = np.random.RandomState(2).randint(0, 255, (96, 96, 3), np.uint8)
        res = sam.predict(img, points=[[48, 48]], labels=[1])
        assert res.masks.shape[1:] == (96, 96)


class TestAMGParity:
    """Automatic-mask-generation crop pyramid (VERDICT r3 #3): our
    generate() vs the reference Predictor.generate on shared random-init
    weights at crop_n_layers in {0, 1}."""

    @staticmethod
    def _tv_nms(boxes, scores, iou_thres):
        """Real torchvision.ops.nms semantics for the shimmed module."""
        idx = torch.argsort(scores, descending=True)
        keep = []
        while idx.numel():
            i = idx[0]
            keep.append(int(i))
            if idx.numel() == 1:
                break
            rest = idx[1:]
            xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (xx2 - xx1).clamp(0) * (yy2 - yy1).clamp(0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a_i + a_r - inter).clamp(min=1e-9)
            idx = rest[iou <= iou_thres]
        return torch.tensor(keep, dtype=torch.long)

    @pytest.fixture(scope="class")
    def pair(self, ref_sam):
        """Tiny shared-weight (reference Predictor, our SAM facade) pair."""
        sys.path.insert(0, REF)
        try:
            from ultralytics.models.sam.build import _build_sam
            from ultralytics.models.sam.predict import Predictor
        finally:
            sys.path.remove(REF)
        sys.modules["torchvision"].ops.nms = self._tv_nms

        t_sam = _build_sam(encoder_embed_dim=64, encoder_depth=2,
                           encoder_num_heads=2, encoder_global_attn_indexes=[1])
        t_sam = _seeded(t_sam.eval(), seed=3)
        t_sam.set_imgsz((256, 256))

        pred = Predictor(overrides=dict(imgsz=256, save=False, verbose=False))
        pred.setup_model(model=t_sam, verbose=False)
        pred.batch = (["img.jpg"], [np.zeros((256, 256, 3), np.uint8)])

        from fce_yolo_tpu.models.sam import SAM

        ours = SAM(variant="sam_b", img_size=256, _random_init=True,
                   _cfg=dict(encoder_embed_dim=64, encoder_depth=2,
                             encoder_num_heads=2,
                             encoder_global_attn_indexes=(1,)))
        from fce_yolo_tpu.nn.sam import sam_state_dict_to_variables

        ours.variables = sam_state_dict_to_variables(t_sam.state_dict())
        return pred, ours, t_sam

    def test_crop_grid_helpers_match_reference(self, ref_sam):
        sys.path.insert(0, REF)
        try:
            from ultralytics.models.sam import amg as ref_amg
        finally:
            sys.path.remove(REF)
        from fce_yolo_tpu.models.sam import (build_all_layer_point_grids,
                                             generate_crop_boxes)

        for size, layers, ov in [((256, 256), 0, 512 / 1500),
                                 ((256, 256), 2, 512 / 1500),
                                 ((200, 310), 1, 0.25)]:
            rb, rl = ref_amg.generate_crop_boxes(size, layers, ov)
            ob, ol = generate_crop_boxes(size, layers, ov)
            assert ob == [list(b) for b in rb] and ol == list(rl)
        for n, layers, scale in [(32, 0, 1), (8, 2, 2)]:
            rg = ref_amg.build_all_layer_point_grids(n, layers, scale)
            og = build_all_layer_point_grids(n, layers, scale)
            assert len(rg) == len(og)
            for a, b in zip(rg, og):
                np.testing.assert_allclose(a, b, atol=1e-7)

    @pytest.mark.parametrize("crop_n_layers", [0, 1])
    def test_generate_set_parity(self, pair, crop_n_layers):
        pred, ours, t_sam = pair
        rng = np.random.RandomState(11)
        img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)

        # thresholds picked from the score distribution so the comparison
        # is not knife-edged on float noise
        ours.set_image(img)
        probe = ours.generate(conf_thres=-1e9, stability_score_thresh=-1e9,
                              points_stride=6, points_batch_size=16,
                              crop_n_layers=0)
        cut = float(np.median(probe.scores)) if len(probe.scores) else 0.0

        kw = dict(crop_n_layers=crop_n_layers, points_stride=6,
                  points_batch_size=16, conf_thres=cut,
                  stability_score_thresh=0.5, stability_score_offset=0.5)

        with torch.no_grad():
            im = torch.from_numpy(img.transpose(2, 0, 1))[None].float()
            im = (im - pred.mean) / pred.std
            r_masks, r_scores, r_boxes = pred.generate(im, **kw)
        r_masks = r_masks.numpy()
        r_scores = r_scores.numpy()
        r_boxes = r_boxes.numpy()

        ours.set_image(img)
        res = ours.generate(**kw)

        assert len(res.model_masks) == len(r_masks), (
            f"mask count {len(res.model_masks)} vs reference {len(r_masks)}"
        )
        # same candidate set: greedy best-IoU matching, every pair tight
        used = set()
        for i, m in enumerate(res.model_masks):
            ious = [
                (np.logical_and(m, rm).sum() / max(np.logical_or(m, rm).sum(), 1), j)
                for j, rm in enumerate(r_masks) if j not in used
            ]
            iou, j = max(ious)
            assert iou > 0.95, f"mask {i}: best IoU {iou:.3f}"
            assert abs(res.scores[i] - r_scores[j]) < 5e-3
            np.testing.assert_allclose(res.model_boxes[i], r_boxes[j], atol=2)
            used.add(j)
