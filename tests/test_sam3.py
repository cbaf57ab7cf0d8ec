"""SAM3 tests: tiny-config forward shapes and random-weight activation
parity vs the torch reference (ViTDet + Sam3DualViTDetNeck + VETextEncoder +
TransformerEncoderFusion + TransformerDecoder + SequenceGeometryEncoder +
DotProductScoring + UniversalSegmentationHead via SAM3SemanticModel,
reference build wiring build_sam3.py:26-240).

torchvision is absent in this image; the fixture installs a pure-torch
``roi_align`` implementing torchvision's aligned=False semantics (adaptive
sampling_ratio = ceil(bin)).  Exemplar boxes in the parity case are sized so
bin ∈ (1, 2], where the TPU port's STATIC sampling_ratio=2 grid is exact.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

if not os.path.isdir(os.path.join(REF, "ultralytics")):
    pytest.skip("reference repo unavailable", allow_module_level=True)

# trunk 8x8 tokens (112/14), window 2 | 8, global block mid-stack; neck
# scale factors (4,2,1,.5) -> 32/16/8/4, scalp drops 4.
TINY = dict(img_size=112, patch_size=14, embed_dim=16, depth=2, num_heads=2,
            mlp_ratio=2.0, global_att_blocks=(1,), window_size=2,
            pretrain_img_size=28, text_width=32, text_heads=2, text_layers=2,
            context_length=8, vocab_size=64, d_model=32, enc_layers=2,
            dec_layers=2, num_queries=10, ffn_dim=64)

TOKENS = np.array([[5, 9, 3, 2, 0, 0, 0, 0]], np.int64)  # 0 = pad
# normalized cxcywh exemplars; w,h ≈ 0.95 -> 7.6 px on the 8x8 f16 map ->
# roi_align bin = 7.6/7 ∈ (1, 2] (static-grid parity regime)
BOXES = np.array([[[0.49, 0.50, 0.95, 0.94], [0.52, 0.48, 0.93, 0.95]]],
                 np.float32)


def _tiny_flax():
    from fce_yolo_tpu.nn.sam3 import SAM3SemanticModel

    return SAM3SemanticModel(**TINY)


def test_sam3_forward_shapes():
    m = _tiny_flax()
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    tok = jnp.asarray(TOKENS, jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, tok)
    out = m.apply(v, x, tok, geo_boxes=jnp.asarray(BOXES),
                  geo_mask=jnp.zeros((1, 2), bool),
                  geo_labels=jnp.ones((1, 2), jnp.int32))
    assert out["pred_logits"].shape == (1, 10, 1)
    assert out["pred_boxes"].shape == (1, 10, 4)
    assert out["presence_logit_dec"].shape == (1, 1)
    assert out["pred_masks"].shape[:2] == (1, 10)
    assert out["semantic_seg"].shape[:2] == (1, 1)
    for k, o in out.items():
        assert bool(jnp.isfinite(jnp.asarray(o)).all()), k


def test_sam3_facade_predict():
    """Concept predictor plumbing: text + box-exemplar prompts through the
    tiny model, outputs in the original frame."""
    from fce_yolo_tpu.models.sam3 import SAM3

    m = SAM3(_random_init=True, _cfg=TINY)
    img = (np.random.RandomState(0).uniform(0, 255, (90, 120, 3))
           ).astype(np.uint8)
    res = m.predict(img, text=["a cat", "a dog"], conf=0.0)
    assert res.boxes.shape[1] == 4 and len(res.scores) == len(res.cls)
    assert res.masks.shape[1:] == (90, 120)
    assert set(np.unique(res.cls)).issubset({0, 1})
    # exemplar-box prompting (single concept)
    res2 = m.predict(img, bboxes=[[10, 10, 60, 60]], conf=0.0)
    assert (res2.cls == 0).all() and res2.masks.shape[1:] == (90, 120)


def _torch_roi_align(feat, boxes_list, output_size):
    """torchvision.ops.roi_align (spatial_scale=1, sampling_ratio=-1,
    aligned=False) in pure torch, for the shim below."""
    import torch

    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    oh, ow = output_size
    n, c, h, w = feat.shape
    outs = []
    for b, rois in enumerate(boxes_list):
        img = feat[b]
        for roi in rois:
            x1, y1, x2, y2 = [float(v) for v in roi]
            roi_w = max(x2 - x1, 1.0)
            roi_h = max(y2 - y1, 1.0)
            bin_w, bin_h = roi_w / ow, roi_h / oh
            gx = max(1, math.ceil(bin_w))
            gy = max(1, math.ceil(bin_h))
            ys = y1 + (torch.arange(oh, dtype=feat.dtype)[:, None]
                       + (torch.arange(gy, dtype=feat.dtype)[None] + 0.5) / gy
                       ) * bin_h  # (oh, gy)
            xs = x1 + (torch.arange(ow, dtype=feat.dtype)[:, None]
                       + (torch.arange(gx, dtype=feat.dtype)[None] + 0.5) / gx
                       ) * bin_w
            yy = ys.reshape(-1, 1).expand(oh * gy, ow * gx)
            xx = xs.reshape(1, -1).expand(oh * gy, ow * gx)
            oob = (yy < -1) | (yy > h) | (xx < -1) | (xx > w)
            yc = yy.clamp(0, h - 1)
            xc = xx.clamp(0, w - 1)
            y0 = yc.floor().long()
            x0 = xc.floor().long()
            y1i = (y0 + 1).clamp(max=h - 1)
            x1i = (x0 + 1).clamp(max=w - 1)
            wy, wx = yc - y0, xc - x0
            v = (img[:, y0, x0] * (1 - wy) * (1 - wx)
                 + img[:, y0, x1i] * (1 - wy) * wx
                 + img[:, y1i, x0] * wy * (1 - wx)
                 + img[:, y1i, x1i] * wy * wx)
            v = torch.where(oob[None], torch.zeros_like(v), v)
            v = v.reshape(c, oh, gy, ow, gx).mean(dim=(2, 4))
            outs.append(v)
    return torch.stack(outs, 0)


@pytest.fixture(scope="module")
def ref_pkg():
    import importlib.metadata as md

    orig = md.version

    def fake_version(name, *a, **k):
        try:
            return orig(name)
        except Exception:
            return "0.23.0"

    md.version = fake_version
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        import importlib.machinery as _ilm
        tv.__spec__ = _ilm.ModuleSpec("torchvision", None)
        tv.__version__ = "0.23.0"
        tv.ops = types.ModuleType("torchvision.ops")
        tv.ops.nms = None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
    # another test file (test_sam2) may have stubbed a bare torchvision
    # already — the roi_align SUBMODULE must be registered regardless
    if "torchvision.ops.roi_align" not in sys.modules:
        tv_roi = types.ModuleType("torchvision.ops.roi_align")
        tv_roi.RoIAlign = type("RoIAlign", (), {"__init__": lambda self, *a, **k: None})
        tv.ops.roi_align = tv_roi
        sys.modules["torchvision.ops.roi_align"] = tv_roi
    # the geometry encoder calls torchvision.ops.roi_align(...) as a fn
    tv.ops.roi_align = _torch_roi_align
    if "timm" not in sys.modules:
        import torch.nn as tnn

        class _Mlp(tnn.Module):  # timm.layers.Mlp twin (fc1/act/fc2)
            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=tnn.GELU, drop=0.0,
                         **kw):
                super().__init__()
                hidden_features = hidden_features or in_features
                out_features = out_features or in_features
                self.fc1 = tnn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = tnn.Linear(hidden_features, out_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        timm = types.ModuleType("timm")
        timm.__version__ = "1.0.0"
        timm.layers = types.ModuleType("timm.layers")
        timm.layers.Mlp = _Mlp
        timm.layers.DropPath = lambda *a, **k: tnn.Identity()
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = timm.layers
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)
    import ultralytics  # restore module-fn shim for other test files

    tv.ops.roi_align = sys.modules.get("torchvision.ops.roi_align", None) or tv.ops.roi_align


@pytest.mark.parity
class TestSAM3Parity:
    @pytest.fixture(scope="class")
    def pair(self, ref_pkg):
        """Tiny torch SAM3SemanticModel (build_sam3.py wiring, shrunken
        dims) + flax twin with the imported state dict."""
        import torch
        import torch.nn as tnn
        from ultralytics.nn.modules.transformer import MLP
        from ultralytics.models.sam.modules.blocks import PositionEmbeddingSine
        from ultralytics.models.sam.sam3.decoder import (
            TransformerDecoder, TransformerDecoderLayer)
        from ultralytics.models.sam.sam3.encoder import (
            TransformerEncoderFusion, TransformerEncoderLayer)
        from ultralytics.models.sam.sam3.geometry_encoders import (
            SequenceGeometryEncoder)
        from ultralytics.models.sam.sam3.maskformer_segmentation import (
            PixelDecoder, UniversalSegmentationHead)
        from ultralytics.models.sam.sam3.model_misc import (
            DotProductScoring, TransformerWrapper)
        from ultralytics.models.sam.sam3.necks import Sam3DualViTDetNeck
        from ultralytics.models.sam.sam3.sam3_image import SAM3SemanticModel
        from ultralytics.models.sam.sam3.text_encoder_ve import VETextEncoder
        from ultralytics.models.sam.sam3.vitdet import ViT
        from ultralytics.models.sam.sam3.vl_combiner import SAM3VLBackbone

        torch.manual_seed(0)
        d = TINY["d_model"]

        def pos_enc():
            return PositionEmbeddingSine(num_pos_feats=d, normalize=True,
                                         scale=None, temperature=10000)

        vit = ViT(
            img_size=TINY["img_size"], pretrain_img_size=TINY["pretrain_img_size"],
            patch_size=TINY["patch_size"], embed_dim=TINY["embed_dim"],
            depth=TINY["depth"], num_heads=TINY["num_heads"],
            mlp_ratio=TINY["mlp_ratio"], norm_layer="LayerNorm",
            drop_path_rate=0.0, qkv_bias=True, use_abs_pos=True,
            tile_abs_pos=True, global_att_blocks=TINY["global_att_blocks"],
            rel_pos_blocks=(), use_rope=True, use_interp_rope=True,
            window_size=TINY["window_size"], pretrain_use_cls_token=True,
            retain_cls_token=False, ln_pre=True, ln_post=False,
            return_interm_layers=False, bias_patch_embed=False)
        visual = Sam3DualViTDetNeck(
            position_encoding=pos_enc(), d_model=d,
            scale_factors=[4.0, 2.0, 1.0, 0.5], trunk=vit,
            add_sam2_neck=False)

        class _Tok:
            def __call__(self, texts, context_length):
                return torch.as_tensor(TOKENS[: len(texts), :context_length])

        text = VETextEncoder(
            tokenizer=_Tok(), d_model=d, width=TINY["text_width"],
            heads=TINY["text_heads"], layers=TINY["text_layers"],
            context_length=TINY["context_length"],
            vocab_size=TINY["vocab_size"])
        backbone = SAM3VLBackbone(visual=visual, text=text, scalp=1)

        encoder = TransformerEncoderFusion(
            layer=TransformerEncoderLayer(
                d_model=d, dim_feedforward=TINY["ffn_dim"], dropout=0.0,
                pos_enc_at_attn=True, pos_enc_at_cross_attn_keys=False,
                pos_enc_at_cross_attn_queries=False, pre_norm=True,
                self_attention=tnn.MultiheadAttention(num_heads=8, dropout=0.0,
                                                      embed_dim=d, batch_first=True),
                cross_attention=tnn.MultiheadAttention(num_heads=8, dropout=0.0,
                                                       embed_dim=d, batch_first=True)),
            num_layers=TINY["enc_layers"], d_model=d, num_feature_levels=1,
            frozen=False, use_act_checkpoint=False,
            add_pooled_text_to_img_feat=False, pool_text_with_mask=True)
        decoder = TransformerDecoder(
            layer=TransformerDecoderLayer(
                d_model=d, dim_feedforward=TINY["ffn_dim"], dropout=0.0,
                cross_attention=tnn.MultiheadAttention(num_heads=8, dropout=0.0,
                                                       embed_dim=d),
                n_heads=8, use_text_cross_attention=True),
            num_layers=TINY["dec_layers"], num_queries=TINY["num_queries"],
            return_intermediate=True, box_refine=True, num_o2m_queries=0,
            dac=True, boxRPB="log", d_model=d, frozen=False,
            interaction_layer=None, dac_use_selfatt_ln=True,
            use_act_checkpoint=False, presence_token=True)
        transformer = TransformerWrapper(encoder=encoder, decoder=decoder,
                                         d_model=d)

        dot = DotProductScoring(
            d_model=d, d_proj=d,
            prompt_mlp=MLP(input_dim=d, hidden_dim=TINY["ffn_dim"],
                           output_dim=d, num_layers=2, residual=True,
                           out_norm=tnn.LayerNorm(d)))
        seg = UniversalSegmentationHead(
            hidden_dim=d, upsampling_stages=3, aux_masks=False,
            presence_head=False, dot_product_scorer=None, act_ckpt=False,
            cross_attend_prompt=tnn.MultiheadAttention(num_heads=8, dropout=0,
                                                       embed_dim=d),
            pixel_decoder=PixelDecoder(num_upsampling_stages=3,
                                       interpolation_mode="nearest",
                                       hidden_dim=d))
        geom = SequenceGeometryEncoder(
            pos_enc=pos_enc(), encode_boxes_as_points=False,
            boxes_direct_project=True, boxes_pool=True, boxes_pos_enc=True,
            d_model=d, num_layers=3,
            layer=TransformerEncoderLayer(
                d_model=d, dim_feedforward=TINY["ffn_dim"], dropout=0.0,
                pos_enc_at_attn=False, pre_norm=True,
                pos_enc_at_cross_attn_queries=False,
                pos_enc_at_cross_attn_keys=True,
                self_attention=tnn.MultiheadAttention(num_heads=8, dropout=0.0,
                                                      embed_dim=d),
                cross_attention=tnn.MultiheadAttention(num_heads=8, dropout=0.0,
                                                       embed_dim=d)),
            use_act_ckpt=False, add_cls=True, add_post_encode_proj=True)

        tmodel = SAM3SemanticModel(
            backbone=backbone, transformer=transformer,
            input_geometry_encoder=geom, segmentation_head=seg,
            num_feature_levels=1, o2m_mask_predict=True,
            dot_prod_scoring=dot, use_instance_query=False,
            multimask_output=True)
        g = torch.Generator().manual_seed(1)
        with torch.no_grad():
            for p in tmodel.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        tmodel.eval()

        from fce_yolo_tpu.nn.sam3 import (SAM3SemanticModel as FlaxSAM3,
                                          sam3_state_dict_to_variables)

        fmodel = FlaxSAM3(**TINY)
        fvars = sam3_state_dict_to_variables(tmodel.state_dict())
        return tmodel, fmodel, fvars

    @pytest.fixture(scope="class")
    def img(self):
        rng = np.random.RandomState(3)
        return rng.uniform(0, 1, (1, 112, 112, 3)).astype(np.float32)

    def test_image_encoder_parity(self, pair, img):
        import torch

        tmodel, fmodel, fvars = pair
        with torch.no_grad():
            tout = tmodel.backbone.forward_image(
                torch.from_numpy(img.transpose(0, 3, 1, 2)))
        fout = fmodel.apply(fvars, jnp.asarray(img), method=fmodel.encode_image)
        assert len(fout["backbone_fpn"]) == len(tout["backbone_fpn"])
        for tf, ff in zip(tout["backbone_fpn"], fout["backbone_fpn"]):
            np.testing.assert_allclose(
                np.asarray(ff).transpose(0, 3, 1, 2), tf.numpy(),
                atol=2e-4, rtol=2e-3)

    def test_text_encoder_parity(self, pair):
        import torch

        tmodel, fmodel, fvars = pair
        with torch.no_grad():
            temb = tmodel.backbone.forward_text(["a photo of a cat"])
        fmask, ffeat = fmodel.apply(fvars, jnp.asarray(TOKENS, jnp.int32),
                                    method=fmodel.encode_text)
        # torch language_features: (L, P, d) seq-first
        np.testing.assert_allclose(
            np.asarray(ffeat)[0], temb["language_features"][:, 0].numpy(),
            atol=2e-4, rtol=2e-3)
        np.testing.assert_array_equal(
            np.asarray(fmask)[0], temb["language_mask"][0].numpy())

    def test_grounding_parity(self, pair, img):
        import torch
        from ultralytics.models.sam.sam3.geometry_encoders import Prompt

        tmodel, fmodel, fvars = pair
        timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
        with torch.no_grad():
            backbone_out = tmodel.backbone.forward_image(timg)
            tmodel.set_classes(["a photo of a cat"])
            prompt = Prompt(
                box_embeddings=torch.from_numpy(BOXES).transpose(0, 1),
                box_mask=torch.zeros(1, 2, dtype=torch.bool),
                box_labels=torch.ones(2, 1, dtype=torch.long))
            tout = tmodel.forward_grounding(
                backbone_out, text_ids=torch.tensor([0]),
                geometric_prompt=prompt)

        fb = fmodel.apply(fvars, jnp.asarray(img), method=fmodel.encode_image)
        fmask, ffeat = fmodel.apply(fvars, jnp.asarray(TOKENS, jnp.int32),
                                    method=fmodel.encode_text)
        fout = fmodel.apply(fvars, fb, fmask, ffeat,
                            jnp.asarray(BOXES), jnp.zeros((1, 2), bool),
                            jnp.ones((1, 2), jnp.int32),
                            method=fmodel.forward_grounding)

        np.testing.assert_allclose(np.asarray(fout["pred_logits"]),
                                   tout["pred_logits"].numpy(),
                                   atol=5e-4, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(fout["pred_boxes"]),
                                   tout["pred_boxes"].numpy(),
                                   atol=5e-4, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(fout["presence_logit_dec"]),
                                   tout["presence_logit_dec"].numpy().reshape(1, 1),
                                   atol=5e-4, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(fout["pred_masks"]),
                                   tout["pred_masks"].numpy(),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(fout["semantic_seg"]),
                                   tout["semantic_seg"].numpy(),
                                   atol=5e-3, rtol=5e-3)


# ---------------------------------------------------------------------------
# SAM3 video tracker (SAM2 memory machinery over the ViTDet trunk)
# ---------------------------------------------------------------------------

# trunk 8x8 tokens (112/14); SAM2-neck grid 8 -> mask interpol 8*16=128
TRACK_TINY = dict(
    image_size=112, backbone_stride=14, mem_attn_layers=2,
    trunk_cfg=dict(img_size=112, patch_size=14, embed_dim=16, depth=2,
                   num_heads=2, mlp_ratio=2.0, global_att_blocks=(1,),
                   window_size=2, pretrain_img_size=28))


def test_sam3_tracker_video_runs():
    """Point-prompted streaming track through the SAM3 tracker facade:
    fixed-capacity memory bank, one compiled program per stage."""
    import cv2

    from fce_yolo_tpu.models.sam3 import SAM3VideoPredictor

    vp = SAM3VideoPredictor(_random_init=True, _cfg=TRACK_TINY)
    frames = []
    for t in range(3):
        f = np.full((96, 96, 3), 40, np.uint8)
        cv2.circle(f, (30 + 8 * t, 48), 14, (250, 120, 60), -1)
        frames.append(f)
    masks = list(vp.track(frames, points=[[30, 48]], labels=[1]))
    assert len(masks) == 3
    for m in masks:
        assert m.shape == (96, 96) and m.dtype == bool


def test_sam3_multi_object_suppression():
    """_suppress_object_pw_area_shrinkage semantics (sam.py:1139-1160):
    per-pixel winner keeps its logits; heavy-shrink losers are clamped."""
    from fce_yolo_tpu.nn.sam3 import SAM3TrackerModel

    m = np.full((2, 1, 4, 4), -5.0, np.float32)
    m[0, 0, :2] = 3.0       # obj0 owns the top half
    m[1, 0, :2] = 2.0       # obj1 fully overlapped by obj0 -> shrinks 100%
    m[1, 0, 3, :2] = 1.0    # ...except two pixels it owns (ratio 2/6 < 0.3)
    out = np.asarray(SAM3TrackerModel.suppress_object_pw_area_shrinkage(
        jnp.asarray(m)))
    np.testing.assert_allclose(out[0], m[0])          # winner untouched
    assert (out[1] <= -5.0).all()                     # loser fully suppressed


@pytest.mark.parity
class TestSAM3TrackerParity:
    @pytest.fixture(scope="class")
    def pair(self, ref_pkg):
        """Tiny torch SAM3Model video tracker (build_interactive_sam3
        wiring, build_sam3.py:258-343, shrunk trunk) + flax twin with the
        imported state dict."""
        import torch
        from ultralytics.models.sam.modules.blocks import (
            PositionEmbeddingSine, RoPEAttention)
        from ultralytics.models.sam.modules.encoders import MemoryEncoder
        from ultralytics.models.sam.modules.memory_attention import (
            MemoryAttention, MemoryAttentionLayer)
        from ultralytics.models.sam.modules.sam import SAM3Model
        from ultralytics.models.sam.sam3.necks import Sam3DualViTDetNeck
        from ultralytics.models.sam.sam3.vitdet import ViT
        from ultralytics.models.sam.sam3.vl_combiner import SAM3VLBackbone

        torch.manual_seed(0)
        tc = TRACK_TINY["trunk_cfg"]
        vit = ViT(
            img_size=tc["img_size"], pretrain_img_size=tc["pretrain_img_size"],
            patch_size=tc["patch_size"], embed_dim=tc["embed_dim"],
            depth=tc["depth"], num_heads=tc["num_heads"],
            mlp_ratio=tc["mlp_ratio"], norm_layer="LayerNorm",
            drop_path_rate=0.0, qkv_bias=True, use_abs_pos=True,
            tile_abs_pos=True, global_att_blocks=tc["global_att_blocks"],
            rel_pos_blocks=(), use_rope=True, use_interp_rope=True,
            window_size=tc["window_size"], pretrain_use_cls_token=True,
            retain_cls_token=False, ln_pre=True, ln_post=False,
            return_interm_layers=False, bias_patch_embed=False)
        visual = Sam3DualViTDetNeck(
            position_encoding=PositionEmbeddingSine(
                num_pos_feats=256, normalize=True, scale=None,
                temperature=10000),
            d_model=256, scale_factors=[4.0, 2.0, 1.0, 0.5], trunk=vit,
            add_sam2_neck=True)
        backbone = SAM3VLBackbone(scalp=1, visual=visual, text=None)
        mem_attn = MemoryAttention(
            batch_first=True, d_model=256, pos_enc_at_input=True,
            num_layers=TRACK_TINY["mem_attn_layers"],
            layer=MemoryAttentionLayer(
                dim_feedforward=2048, dropout=0.0, pos_enc_at_attn=False,
                pos_enc_at_cross_attn_keys=True,
                pos_enc_at_cross_attn_queries=False, d_model=256,
                self_attn=RoPEAttention(
                    embedding_dim=256, num_heads=1, downsample_rate=1,
                    rope_theta=10000.0, feat_sizes=[8, 8]),
                cross_attn=RoPEAttention(
                    embedding_dim=256, num_heads=1, downsample_rate=1,
                    kv_in_dim=64, rope_theta=10000.0, feat_sizes=[8, 8],
                    rope_k_repeat=True)))
        tm = SAM3Model(
            image_size=112, image_encoder=backbone,
            memory_attention=mem_attn,
            memory_encoder=MemoryEncoder(out_dim=64, interpol_size=[128, 128]),
            backbone_stride=14, num_maskmem=7,
            sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
            use_mask_input_as_output_without_sam=True,
            directly_add_no_mem_embed=True,
            use_high_res_features_in_sam=True,
            multimask_output_in_sam=True,
            iou_prediction_use_sigmoid=True,
            use_obj_ptrs_in_encoder=True,
            add_tpos_enc_to_obj_ptrs=True,
            only_obj_ptrs_in_the_past_for_eval=True,
            pred_obj_scores=True, pred_obj_scores_mlp=True,
            fixed_no_obj_ptr=True,
            multimask_output_for_tracking=True,
            use_multimask_token_for_obj_ptr=True,
            multimask_min_pt_num=0, multimask_max_pt_num=1,
            use_mlp_for_obj_ptr_proj=True,
            compile_image_encoder=False,
            no_obj_embed_spatial=True,
            proj_tpos_enc_in_obj_ptrs=True,
            use_signed_tpos_enc_to_obj_ptrs=True,
            sam_mask_decoder_extra_args=dict(
                dynamic_multimask_via_stability=True,
                dynamic_multimask_stability_delta=0.05,
                dynamic_multimask_stability_thresh=0.98)).eval().float()
        # randomize the zero/trunc-normal params so the test has signal
        with torch.no_grad():
            for p in tm.parameters():
                if p.numel() > 1 and p.std() < 1e-8:
                    p.normal_(0, 0.02)

        from fce_yolo_tpu.nn.sam3 import (
            SAM3TrackerModel, sam3_tracker_state_dict_to_variables)

        jm = SAM3TrackerModel(**TRACK_TINY)
        jv = sam3_tracker_state_dict_to_variables(tm.state_dict())
        return tm, jm, jv

    def test_image_encoder_parity(self, pair):
        import torch

        tm, jm, jv = pair
        rng = np.random.RandomState(1)
        x = rng.randn(1, 112, 112, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm.forward_image(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = jm.apply(jv, jnp.asarray(x), method=jm.encode_image)
        assert len(got["backbone_fpn"]) == 3
        for lvl in range(3):
            r = ref["backbone_fpn"][lvl].numpy().transpose(0, 2, 3, 1)
            g = np.asarray(got["backbone_fpn"][lvl], np.float32)
            np.testing.assert_allclose(g, r, atol=3e-4,
                                       err_msg=f"fpn level {lvl}")
            rp = ref["vision_pos_enc"][lvl].numpy().transpose(0, 2, 3, 1)
            gp = np.asarray(got["vision_pos_enc"][lvl], np.float32)
            np.testing.assert_allclose(gp, rp[0], atol=1e-5,
                                       err_msg=f"pos level {lvl}")

    def test_three_frame_track_parity(self, pair):
        """Frames 0 (point-prompted cond) / 1 / 2 through the reference
        SAM3Model.track_step (signed+projected tpos, no-obj spatial
        embedding, 128-px mask interpol) vs the flax fixed-capacity
        predictor: masks, object pointers and memories match per frame."""
        import torch

        tm, jm, jv = pair
        rng = np.random.RandomState(2)
        frames = [rng.rand(112, 112, 3).astype(np.float32) * 2 - 1
                  for _ in range(3)]
        pts = np.array([[[40.0, 64.0]]], np.float32)
        lab = np.array([[1]], np.int32)

        out_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        ref_masks, ref_ptrs = [], []
        with torch.no_grad():
            for t, f in enumerate(frames):
                img = torch.from_numpy(f.transpose(2, 0, 1))[None]
                backbone_out = tm.forward_image(img)
                (_, vision_feats, vision_pos, feat_sizes
                 ) = tm._prepare_backbone_features(backbone_out)
                point_inputs = (
                    {"point_coords": torch.from_numpy(pts),
                     "point_labels": torch.from_numpy(lab)} if t == 0 else None)
                out = tm.track_step(
                    frame_idx=t, is_init_cond_frame=(t == 0),
                    current_vision_feats=vision_feats,
                    current_vision_pos_embeds=vision_pos,
                    feat_sizes=feat_sizes, point_inputs=point_inputs,
                    mask_inputs=None, output_dict=out_dict, num_frames=3)
                key = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
                out_dict[key][t] = out
                ref_masks.append(out["pred_masks"].numpy())
                ref_ptrs.append(out["obj_ptr"].numpy())

        from fce_yolo_tpu.models.sam2 import SAM2VideoPredictor

        vp = SAM2VideoPredictor.__new__(SAM2VideoPredictor)
        vp.image_size = 112
        vp.model = jm
        vp.variables = jv
        vp._jits = {}
        vp.num_maskmem = 7
        vp.max_obj_ptrs = 16

        x0 = jnp.asarray(frames[0])[None]
        low, high, ptr, score, mem, _ = vp._cond_step()(
            jv, x0, jnp.asarray(pts), jnp.asarray(lab))
        np.testing.assert_allclose(np.asarray(low), ref_masks[0], atol=3e-3)
        np.testing.assert_allclose(np.asarray(ptr), ref_ptrs[0], atol=2e-3)

        hw = mem.shape[1] * mem.shape[2]
        cond_mem = np.asarray(mem).reshape(hw, 64)
        ref_mem0 = out_dict["cond_frame_outputs"][0]["maskmem_features"]
        np.testing.assert_allclose(
            cond_mem.reshape(mem.shape[1], mem.shape[2], 64),
            ref_mem0.numpy()[0].transpose(1, 2, 0), atol=2e-3)

        step = vp._track_frame()
        recent = []
        cond_ptr = np.asarray(ptr)[0]
        for t in (1, 2):
            maskmem = np.zeros((7, hw, 64), np.float32)
            mem_valid = np.zeros((7,), bool)
            maskmem[0], mem_valid[0] = cond_mem, True
            by_t = {ft: fm for ft, fm, _ in recent}
            for t_pos in range(1, 7):
                prev_t = t - (7 - t_pos)
                if prev_t in by_t:
                    maskmem[t_pos], mem_valid[t_pos] = by_t[prev_t], True
            obj_ptrs = np.zeros((16, 256), np.float32)
            obj_t = np.zeros((16,), np.float32)
            ptr_valid = np.zeros((16,), bool)
            obj_ptrs[0], obj_t[0], ptr_valid[0] = cond_ptr, float(t), True
            k = 1
            for ft, _, fp in sorted(recent, key=lambda z: -z[0]):
                if ft == 0 or k >= 16:
                    continue
                obj_ptrs[k], obj_t[k], ptr_valid[k] = fp, float(t - ft), True
                k += 1
            low, high, ptr, score, mem = step(
                jv, jnp.asarray(frames[t])[None],
                jnp.asarray(maskmem), jnp.asarray(mem_valid),
                jnp.asarray(obj_ptrs), jnp.asarray(obj_t),
                jnp.asarray(ptr_valid), jnp.float32(min(3, 16) - 1))
            np.testing.assert_allclose(np.asarray(low), ref_masks[t], atol=5e-3,
                                       err_msg=f"frame {t} mask")
            np.testing.assert_allclose(np.asarray(ptr), ref_ptrs[t], atol=3e-3,
                                       err_msg=f"frame {t} obj_ptr")
            recent.append((t, np.asarray(mem).reshape(hw, 64), np.asarray(ptr)[0]))

    def test_mask_as_output_parity(self, pair):
        """_use_mask_as_output (sam.py:553-599): given-mask logits, dummy
        IoU, decoder obj_ptr from the downsampled mask, mask-driven object
        score."""
        import torch

        tm, jm, jv = pair
        rng = np.random.RandomState(4)
        x = rng.randn(1, 112, 112, 3).astype(np.float32)
        mask = (rng.rand(1, 112, 112) > 0.6).astype(np.float32)

        with torch.no_grad():
            ref_enc = tm.forward_image(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            (_, vfeats, _, fsizes) = tm._prepare_backbone_features(ref_enc)
            high_res = [
                f.permute(1, 2, 0).view(f.size(1), f.size(2), *s)
                for f, s in zip(vfeats[:-1], fsizes[:-1])]
            pix = vfeats[-1].permute(1, 2, 0).view(1, -1, *fsizes[-1])
            ref = tm._use_mask_as_output(
                torch.from_numpy(mask)[:, None], pix, high_res)

        enc = jm.apply(jv, jnp.asarray(x), method=jm.encode_image)
        f0, f1, f16 = enc["backbone_fpn"]
        got = jm.apply(jv, jnp.asarray(mask)[..., None], f16, [f0, f1],
                       method=jm.use_mask_as_output)
        np.testing.assert_allclose(np.asarray(got[4]), ref[4].numpy(),
                                   atol=1e-5)          # high-res masks
        np.testing.assert_allclose(np.asarray(got[3]), ref[3].numpy(),
                                   atol=2e-3)          # low-res (resize)
        np.testing.assert_allclose(np.asarray(got[5]), ref[5].numpy(),
                                   atol=2e-3)          # obj_ptr
        np.testing.assert_allclose(np.asarray(got[6]),
                                   ref[6].numpy().reshape(1, 1), atol=1e-5)


def test_sam3_video_semantic_predictor_runs():
    """Concept video tracking plumbing: detect -> seed masklets via the
    mask-as-output path -> propagate -> associate; ids stay stable and the
    bank respects max_objects."""
    from fce_yolo_tpu.models.sam3 import (SAM3, SAM3VideoPredictor,
                                          SAM3VideoSemanticPredictor)

    sem = SAM3(_random_init=True, _cfg=TINY)
    trk = SAM3VideoPredictor(_random_init=True, _cfg=TRACK_TINY)
    vp = SAM3VideoSemanticPredictor(
        sem, trk, max_objects=3, score_threshold_detection=0.0,
        assoc_iou_thresh=0.5, new_det_thresh=0.0)
    rng = np.random.RandomState(0)
    frames = [rng.uniform(0, 255, (84, 100, 3)).astype(np.uint8)
              for _ in range(3)]
    outs = list(vp.track(frames, text="a cat"))
    assert len(outs) == 3
    seen = {}
    for r in outs:
        assert r.masks.dtype == bool
        assert r.masks.shape[0] == len(r.obj_ids) == len(r.scores)
        assert r.masks.shape[1:] == (84, 100)
        assert len(r.obj_ids) <= 3
        for oid in r.obj_ids:
            seen[int(oid)] = seen.get(int(oid), 0) + 1
    assert seen, "no masklet was ever spawned despite conf=0 detections"


class TestHotstartAndConfirmation:
    """SAM3 video refinements (VERDICT r3 #6): hotstart delay + masklet
    confirmation, driven with scripted masks through the same bookkeeping
    the streaming predictor uses (_associate_and_prune + the emit rules)."""

    @staticmethod
    def _vp(**kw):
        from fce_yolo_tpu.models.sam3 import SAM3VideoSemanticPredictor

        # bookkeeping-only instance: no model calls go through these tests
        return SAM3VideoSemanticPredictor(semantic=None, tracker=None, **kw)

    @staticmethod
    def _slot(oid, t0, mask, keep=5):
        return dict(id=oid, t0=t0, mask=mask, keep=keep, consec=1,
                    status=1, unmatched=[], obj_logit=1.0)

    @staticmethod
    def _masks():
        a = np.zeros((20, 20), bool); a[2:8, 2:8] = True
        b = np.zeros((20, 20), bool); b[12:18, 12:18] = True
        return a, b

    def test_hotstart_unmatch_kills_young_masklet(self):
        """A masklet born inside the hotstart window dies after
        hotstart_unmatch_thresh unmatched frames; an OLD masklet with the
        same history survives (only decays)."""
        vp = self._vp(hotstart_delay=5, hotstart_unmatch_thresh=2,
                      hotstart_dup_thresh=2)
        a, b = self._masks()
        young = self._slot(0, t0=4, mask=a, keep=30)
        old = self._slot(1, t0=-10, mask=b, keep=30)
        slots = [young, old]
        # frames 5,6: no detections at all -> both unmatched
        slots, _ = vp._associate_and_prune(slots, [], [], t=5)
        assert {s["id"] for s in slots} == {0, 1}
        slots, _ = vp._associate_and_prune(slots, [], [], t=6)
        assert {s["id"] for s in slots} == {1}, "young unmatched not removed"

    def test_keep_alive_exhaustion_kills_any_masklet(self):
        vp = self._vp()
        a, _ = self._masks()
        s = self._slot(0, t0=0, mask=a, keep=2)
        slots = [s]
        slots, _ = vp._associate_and_prune(slots, [], [], t=1)  # keep 1
        slots, _ = vp._associate_and_prune(slots, [], [], t=2)  # keep 0 -> dead
        assert slots == []

    def test_hotstart_dup_suppression(self):
        """Two masklets co-matching the same detection: the later-born one
        is removed after hotstart_dup_thresh overlap frames."""
        vp = self._vp(hotstart_delay=6, hotstart_unmatch_thresh=6,
                      hotstart_dup_thresh=2, assoc_iou_thresh=0.3)
        a, _ = self._masks()
        first = self._slot(0, t0=0, mask=a)
        dup = self._slot(1, t0=3, mask=a.copy())
        slots = [first, dup]
        slots, new = vp._associate_and_prune(slots, [a], [0.9], t=4)
        assert {s["id"] for s in slots} == {0, 1} and new == [False]
        slots, _ = vp._associate_and_prune(slots, [a], [0.9], t=5)
        assert {s["id"] for s in slots} == {0}, "duplicate masklet kept"

    def test_old_duplicate_not_suppressed(self):
        """Duplicate suppression only applies within the hotstart window."""
        vp = self._vp(hotstart_delay=2, hotstart_unmatch_thresh=2,
                      hotstart_dup_thresh=2, assoc_iou_thresh=0.3)
        a, _ = self._masks()
        slots = [self._slot(0, t0=0, mask=a), self._slot(1, t0=1, mask=a.copy())]
        for t in (10, 11, 12):  # both long past the window
            slots, _ = vp._associate_and_prune(slots, [a], [0.9], t=t)
        assert {s["id"] for s in slots} == {0, 1}

    def test_confirmation_consecutive_matches(self):
        """consec detections flip UNCONFIRMED -> CONFIRMED (permanent);
        a miss resets the counter of unconfirmed masklets."""
        vp = self._vp(masklet_confirmation_enable=True,
                      masklet_confirmation_consecutive_det_thresh=3)
        a, b = self._masks()
        s = self._slot(0, t0=0, mask=a)
        s["consec"] = 1  # born from a detection (reference init)
        slots = [s]
        slots, _ = vp._associate_and_prune(slots, [a], [0.9], t=1)
        assert slots[0]["status"] == vp.UNCONFIRMED and slots[0]["consec"] == 2
        # miss resets
        slots, _ = vp._associate_and_prune(slots, [b], [0.9], t=2)
        assert slots[0]["consec"] == 0
        for t in (3, 4, 5):
            slots, _ = vp._associate_and_prune(slots, [a], [0.9], t=t)
        assert slots[0]["status"] == vp.CONFIRMED
        # confirmation is permanent through later misses
        slots, _ = vp._associate_and_prune(slots, [b], [0.9], t=6)
        assert slots[0]["status"] == vp.CONFIRMED

    def test_streaming_late_spawn_and_flicker_suppression(self):
        """End-to-end streaming behavior through track(): with
        hotstart_delay=2 a masklet first EMITS 2 frames after it spawns
        (late-spawn hold-back); with confirmation on, a flickering
        (never-consecutively-matched) masklet is reported only in
        unconfirmed_obj_ids, never in the emitted set."""
        from fce_yolo_tpu.models.sam3 import SAM3VideoSemanticPredictor

        vp = SAM3VideoSemanticPredictor(
            semantic=None, tracker=None, hotstart_delay=2,
            hotstart_unmatch_thresh=2, hotstart_dup_thresh=2,
            masklet_confirmation_enable=True,
            masklet_confirmation_consecutive_det_thresh=3)
        a, b = self._masks()

        # simulate the track() loop's emit logic over scripted frames:
        # det A appears every frame (stable); det B appears on alternating
        # frames only (flicker)
        slots = []
        emitted, unconfirmed_log = [], []
        next_id = 0
        for t in range(8):
            dets = [a] + ([b] if t % 2 == 0 else [])
            scores = [0.9] * len(dets)
            # propagation keeps the previous mask (scripted perfect tracker)
            slots, is_new = vp._associate_and_prune(slots, dets, scores, t)
            for di, new in enumerate(is_new):
                if new:
                    s = self._slot(next_id, t0=t, mask=dets[di],
                                   keep=vp.init_trk_keep_alive)
                    slots.append(s)
                    next_id += 1
            live = [s for s in slots
                    if s["keep"] > 0 and t - s["t0"] >= vp.hotstart_delay]
            emit = [s["id"] for s in live if s["status"] == vp.CONFIRMED]
            emitted.append(emit)
            unconfirmed_log.append([s["id"] for s in live
                                    if s["status"] != vp.CONFIRMED])

        # late-spawn: A (id 0, born t=0, confirmed by t=3) emits from t>=3
        assert 0 not in sum(emitted[:2], [])
        assert all(0 in e for e in emitted[4:])
        # flicker suppression: B never reaches 3 consecutive matches ->
        # never emitted, but visible as unconfirmed once past the window
        b_ids = [i for i in range(1, next_id)]
        assert all(not (set(b_ids) & set(e)) for e in emitted)
        assert any(set(b_ids) & set(u) for u in unconfirmed_log)
