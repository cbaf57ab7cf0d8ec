"""SAM2 tests: module forward shapes, random-weight activation parity vs the
torch reference (Hiera/FpnNeck/MemoryEncoder/MemoryAttention/SAM2MaskDecoder
via SAM2Model), and a 3-frame video-tracking parity run against the
reference's track_step memory machinery."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

# global attention (block 3) lands MID-stage-3 — the reference cannot put a
# global block at a q_pool position (ZeroDivisionError, blocks.py:650)
TINY = dict(embed_dim=8, num_heads=1, stages=(1, 1, 2, 1), global_att_blocks=(3,),
            window_spec=(4, 2, 2, 2), backbone_channel_list=(64, 32, 16, 8),
            d_model=256, mem_dim=64, mem_attn_layers=2, image_size=128)


def _tiny_model():
    from fce_yolo_tpu.nn.sam2 import SAM2Model

    return SAM2Model(**TINY)


def test_sam2_forward_shapes():
    from fce_yolo_tpu.nn.sam2 import SAM2Model

    m = SAM2Model(embed_dim=8, num_heads=1, stages=(1, 1, 1, 1),
                  global_att_blocks=(3,), window_spec=(4, 2, 2, 2),
                  backbone_channel_list=(64, 32, 16, 8), d_model=32,
                  mem_dim=16, mem_attn_layers=1, mem_ffn=32, image_size=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, method=m.init_all)
    outs = m.apply(v, x, points=(jnp.asarray([[[20.0, 30.0]]]),
                                 jnp.asarray([[1]])), multimask_output=True)
    low_multi, high_multi, ious, low, high, ptr, obj = outs
    assert low_multi.shape == (1, 3, 16, 16) and high_multi.shape == (1, 3, 64, 64)
    assert low.shape == (1, 1, 16, 16) and high.shape == (1, 1, 64, 64)
    assert ptr.shape == (1, 32) and obj.shape == (1, 1)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_sam2_video_predictor_runs():
    """Fixed-capacity memory bank: 4 frames through ONE compiled track
    program; masks stay finite and the target stays covered."""
    import cv2

    from fce_yolo_tpu.models.sam2 import SAM2VideoPredictor

    vp = SAM2VideoPredictor(variant="sam2_t", image_size=128, _random_init=True)
    vp.model = _tiny_model().__class__(**{**TINY, "image_size": 128})
    # re-init variables for the tiny config
    small = jax.eval_shape(
        lambda k, x: vp.model.init(k, x, method=vp.model.init_all),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 128, 128, 3), np.float32))
    leaves, treedef = jax.tree_util.tree_flatten(small)
    rng = np.random.RandomState(0)
    vp.variables = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves])
    vp._jits = {}

    frames = []
    for t in range(4):
        f = np.full((96, 96, 3), 40, np.uint8)
        cv2.circle(f, (30 + 8 * t, 48), 14, (250, 120, 60), -1)
        frames.append(f)
    masks = list(vp.track(frames, points=[[30, 48]], labels=[1]))
    assert len(masks) == 4
    for m in masks:
        assert m.shape == (96, 96) and m.dtype == bool


def test_sam2_dynamic_interactive_predictor():
    """Support-set workflow (reference SAM2DynamicInteractivePredictor):
    prompt objects on support images (points, boxes, masks), query others;
    the fixed-capacity bank keeps one compiled query program throughout."""
    import cv2

    from fce_yolo_tpu.models.sam2 import SAM2DynamicInteractivePredictor

    p = SAM2DynamicInteractivePredictor(
        variant="sam2_t", image_size=128, _random_init=True,
        max_obj_num=3, max_mem_entries=4)
    p.model = _tiny_model().__class__(**{**TINY, "image_size": 128})
    small = jax.eval_shape(
        lambda k, x: p.model.init(k, x, method=p.model.init_all),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 128, 128, 3), np.float32))
    leaves, treedef = jax.tree_util.tree_flatten(small)
    rng = np.random.RandomState(0)
    p.variables = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves])
    p._jits = {}

    def scene(cx):
        f = np.full((96, 96, 3), 40, np.uint8)
        cv2.circle(f, (cx, 40), 12, (250, 120, 60), -1)
        cv2.rectangle(f, (60, 60), (85, 85), (60, 200, 90), -1)
        return f

    with pytest.raises(RuntimeError):
        p.query(scene(30))

    # two point-prompted objects on support image 1
    p.add_support(scene(30), obj_ids=[0, 1], points=[[30, 40], [72, 72]])
    out = p.query(scene(40))
    assert out["obj_ids"] == [0, 1]
    assert out["masks"].shape == (2, 96, 96) and out["masks"].dtype == bool
    assert out["scores"].shape == (2,) and (out["scores"] >= 0).all()

    # a box-prompted third object on a second support image
    p.add_support(scene(50), obj_ids=[2], bboxes=[[58, 58, 87, 87]])
    out = p.query(scene(35))
    assert out["obj_ids"] == [0, 1, 2] and out["masks"].shape == (3, 96, 96)

    # mask-prompt refresh of object 0; bank stays within capacity
    gt = np.zeros((96, 96), np.float32)
    cv2.circle(gt, (35, 40), 12, 1.0, -1)
    p.add_support(scene(35), obj_ids=[0], masks=[gt])
    for _ in range(3):  # push past max_mem_entries -> oldest evicted
        p.add_support(scene(45), obj_ids=[1], points=[[72, 72]])
    assert p._bank_valid.sum() == 4
    out = p.inference(scene(55))
    assert out["masks"].shape == (3, 96, 96)
    assert np.isfinite(out["scores"]).all()


@pytest.mark.parity
@pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ultralytics")),
                    reason="no reference")
class TestSAM2Parity:
    @pytest.fixture(scope="class")
    def ref_pkg(self):
        import importlib.metadata as md

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
            tv.ops = types.ModuleType("torchvision.ops")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = tv.ops
        sys.path.insert(0, REF)
        yield
        sys.path.remove(REF)

    @pytest.fixture(scope="class")
    def pair(self, ref_pkg):
        """Tiny torch SAM2Model (real 256/64 memory dims, small Hiera trunk)
        + flax twin with the imported state dict."""
        import torch
        from ultralytics.models.sam.modules.encoders import (
            FpnNeck, Hiera, ImageEncoder, MemoryEncoder)
        from ultralytics.models.sam.modules.memory_attention import (
            MemoryAttention, MemoryAttentionLayer)
        from ultralytics.models.sam.modules.sam import SAM2Model as TorchSAM2

        torch.manual_seed(0)
        image_encoder = ImageEncoder(
            trunk=Hiera(embed_dim=8, num_heads=1, stages=(1, 1, 2, 1),
                        global_att_blocks=(3,), window_spec=(4, 2, 2, 2)),
            neck=FpnNeck(d_model=256, backbone_channel_list=[64, 32, 16, 8],
                         fpn_top_down_levels=[2, 3], fpn_interp_model="nearest"),
            scalp=1,
        )
        tm = TorchSAM2(
            image_encoder=image_encoder,
            memory_attention=MemoryAttention(
                d_model=256, pos_enc_at_input=True, num_layers=2,
                layer=MemoryAttentionLayer()),
            memory_encoder=MemoryEncoder(out_dim=64),
            num_maskmem=7, image_size=128,
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
            sam_mask_decoder_extra_args=dict(
                dynamic_multimask_via_stability=True,
                dynamic_multimask_stability_delta=0.05,
                dynamic_multimask_stability_thresh=0.98),
        ).eval().float()
        # randomize the zero/trunc-normal params so the test has signal
        with torch.no_grad():
            for p in tm.parameters():
                if p.numel() > 1 and p.std() < 1e-8:
                    p.normal_(0, 0.02)

        from fce_yolo_tpu.nn.sam2 import sam2_state_dict_to_variables

        jm = _tiny_model()
        jv = sam2_state_dict_to_variables(tm.state_dict(), image_size=128)
        return tm, jm, jv

    def test_image_encoder_parity(self, pair):
        import torch

        tm, jm, jv = pair
        rng = np.random.RandomState(1)
        x = rng.randn(1, 128, 128, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm.forward_image(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = jm.apply(jv, jnp.asarray(x), method=jm.encode_image)
        for lvl in range(3):
            r = ref["backbone_fpn"][lvl].numpy().transpose(0, 2, 3, 1)
            g = np.asarray(got["backbone_fpn"][lvl], np.float32)
            np.testing.assert_allclose(g, r, atol=2e-4,
                                       err_msg=f"fpn level {lvl}")
            rp = ref["vision_pos_enc"][lvl].numpy().transpose(0, 2, 3, 1)
            gp = np.asarray(got["vision_pos_enc"][lvl], np.float32)
            np.testing.assert_allclose(gp, rp[0], atol=1e-5,
                                       err_msg=f"pos level {lvl}")

    def test_three_frame_track_parity(self, pair):
        """Frames 0 (point-prompted cond) / 1 / 2 through the reference
        track_step vs the flax fixed-capacity video predictor: masks, object
        pointers and memories match at every frame."""
        import torch

        tm, jm, jv = pair
        rng = np.random.RandomState(2)
        frames = [rng.rand(128, 128, 3).astype(np.float32) * 2 - 1
                  for _ in range(3)]
        pts = np.array([[[40.0, 64.0]]], np.float32)
        lab = np.array([[1]], np.int32)

        # ---- reference side: the real track_step bookkeeping loop
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

        # ---- flax side: the fixed-capacity streaming predictor programs
        from fce_yolo_tpu.models.sam2 import SAM2VideoPredictor

        vp = SAM2VideoPredictor.__new__(SAM2VideoPredictor)
        vp.image_size = 128
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
