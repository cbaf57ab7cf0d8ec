"""CLIP text tower: activation parity vs a random-init torch
CLIPTextModelWithProjection, openai-naming import equivalence, hash-stub
stability (fce_yolo_tpu/nn/text_model.py; reference nn/text_model.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fce_yolo_tpu.nn.text_model import (  # noqa: E402
    CLIPTextCfg,
    CLIPTextEncoder,
    HashTextEncoder,
    build_text_model,
    clip_text_state_dict_to_variables,
)

CFG = CLIPTextCfg(vocab=512, width=64, heads=4, layers=2, ctx=16, proj=32, eos_id=511)


def _tiny_hf_model():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(
        vocab_size=CFG.vocab, hidden_size=CFG.width, intermediate_size=4 * CFG.width,
        num_hidden_layers=CFG.layers, num_attention_heads=CFG.heads,
        max_position_embeddings=CFG.ctx, projection_dim=CFG.proj,
        hidden_act="quick_gelu", bos_token_id=0, eos_token_id=CFG.eos_id,
        attention_dropout=0.0,
    )
    return CLIPTextModelWithProjection(hf_cfg).eval()


def _tokens(rng, b=3):
    toks = rng.integers(1, CFG.vocab - 1, (b, CFG.ctx)).astype(np.int64)
    for i in range(b):  # one EOT per row at a varying position
        toks[i, 5 + 3 * i] = CFG.eos_id
    return toks


def test_clip_text_parity_hf():
    """HF random-init state dict import -> embedding parity (the world/yoloe
    import-parity pattern applied to the text tower)."""
    m = _tiny_hf_model()
    toks = _tokens(np.random.default_rng(1))
    with torch.inference_mode():
        ref = m(input_ids=torch.from_numpy(toks)).text_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    enc = CLIPTextEncoder(CFG)
    enc.variables = clip_text_state_dict_to_variables(m.state_dict(), CFG)
    ours = enc.encode_text(toks.astype(np.int32))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_clip_text_openai_naming_import():
    """The openai-clip key naming maps to the identical variable tree."""
    m = _tiny_hf_model()
    sd = {k: v for k, v in m.state_dict().items()}
    oa = {
        "token_embedding.weight": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T.contiguous(),
    }
    for i in range(CFG.layers):
        s = f"text_model.encoder.layers.{i}"
        d = f"transformer.resblocks.{i}"
        oa[f"{d}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{s}.self_attn.{n}_proj.weight"] for n in "qkv"], 0)
        oa[f"{d}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{s}.self_attn.{n}_proj.bias"] for n in "qkv"], 0)
        oa[f"{d}.attn.out_proj.weight"] = sd[f"{s}.self_attn.out_proj.weight"]
        oa[f"{d}.attn.out_proj.bias"] = sd[f"{s}.self_attn.out_proj.bias"]
        for a, b in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            oa[f"{d}.{a}.weight"] = sd[f"{s}.{b}.weight"]
            oa[f"{d}.{a}.bias"] = sd[f"{s}.{b}.bias"]
        oa[f"{d}.mlp.c_fc.weight"] = sd[f"{s}.mlp.fc1.weight"]
        oa[f"{d}.mlp.c_fc.bias"] = sd[f"{s}.mlp.fc1.bias"]
        oa[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.fc2.weight"]
        oa[f"{d}.mlp.c_proj.bias"] = sd[f"{s}.mlp.fc2.bias"]

    v_hf = clip_text_state_dict_to_variables(m.state_dict(), CFG)
    v_oa = clip_text_state_dict_to_variables(oa, CFG)
    import jax

    flat_hf = jax.tree_util.tree_leaves_with_path(v_hf)
    flat_oa = dict(jax.tree_util.tree_leaves_with_path(v_oa))
    assert len(flat_hf) == len(flat_oa)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_oa[path], err_msg=str(path))


def test_clip_encoder_facade_and_hash_stub():
    """encode_text over strings (hash-fallback tokenizer), unit norm, batch
    stability; build_text_model routing."""
    assert isinstance(build_text_model("clip"), CLIPTextEncoder)
    enc = CLIPTextEncoder(CFG)  # tiny tower keeps the jit cheap
    e = enc.encode_text(["a red apple", "a dog"])
    assert e.shape == (2, CFG.proj)
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)
    e2 = enc.encode_text(["a red apple", "a dog"])
    np.testing.assert_array_equal(e, e2)

    h = build_text_model("hash:128")
    assert isinstance(h, HashTextEncoder)
    he = h.encode_text(h.tokenize(["x", "y"]))
    assert he.shape == (2, 128)


VCFG = None  # built lazily to keep import cheap


def _vision_cfg():
    from fce_yolo_tpu.nn.clip_vision import CLIPVisionCfg

    return CLIPVisionCfg(image_size=32, patch=8, width=64, heads=4, layers=2, proj=32)


def test_clip_vision_parity_hf():
    """HF CLIPVisionModelWithProjection random-init import -> embedding
    parity (fce_yolo_tpu/nn/clip_vision.py)."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from fce_yolo_tpu.nn.clip_vision import (
        CLIPImageEncoder,
        clip_vision_state_dict_to_variables,
    )

    cfg = _vision_cfg()
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch, hidden_size=cfg.width,
        intermediate_size=4 * cfg.width, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads, projection_dim=cfg.proj,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    m = CLIPVisionModelWithProjection(hf_cfg).eval()
    x = np.random.default_rng(2).standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.inference_mode():
        ref = m(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    enc = CLIPImageEncoder(cfg)
    enc.variables = clip_vision_state_dict_to_variables(m.state_dict(), cfg)
    ours = enc.encode_image(x)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_clip_vision_openai_naming_import():
    """openai `visual.*` keys map to the identical variable tree."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from fce_yolo_tpu.nn.clip_vision import clip_vision_state_dict_to_variables

    cfg = _vision_cfg()
    torch.manual_seed(1)
    m = CLIPVisionModelWithProjection(CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch, hidden_size=cfg.width,
        intermediate_size=4 * cfg.width, num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads, projection_dim=cfg.proj,
        hidden_act="quick_gelu")).eval()
    sd = m.state_dict()
    oa = {
        "visual.conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd["vision_model.post_layernorm.bias"],
        "visual.proj": sd["visual_projection.weight"].T.contiguous(),
    }
    for i in range(cfg.layers):
        s = f"vision_model.encoder.layers.{i}"
        d = f"visual.transformer.resblocks.{i}"
        oa[f"{d}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{s}.self_attn.{n}_proj.weight"] for n in "qkv"], 0)
        oa[f"{d}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{s}.self_attn.{n}_proj.bias"] for n in "qkv"], 0)
        oa[f"{d}.attn.out_proj.weight"] = sd[f"{s}.self_attn.out_proj.weight"]
        oa[f"{d}.attn.out_proj.bias"] = sd[f"{s}.self_attn.out_proj.bias"]
        for a, b in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            oa[f"{d}.{a}.weight"] = sd[f"{s}.{b}.weight"]
            oa[f"{d}.{a}.bias"] = sd[f"{s}.{b}.bias"]
        oa[f"{d}.mlp.c_fc.weight"] = sd[f"{s}.mlp.fc1.weight"]
        oa[f"{d}.mlp.c_fc.bias"] = sd[f"{s}.mlp.fc1.bias"]
        oa[f"{d}.mlp.c_proj.weight"] = sd[f"{s}.mlp.fc2.weight"]
        oa[f"{d}.mlp.c_proj.bias"] = sd[f"{s}.mlp.fc2.bias"]

    import jax

    v_hf = clip_vision_state_dict_to_variables(sd, cfg)
    v_oa = clip_vision_state_dict_to_variables(oa, cfg)
    flat_oa = dict(jax.tree_util.tree_leaves_with_path(v_oa))
    for path, leaf in jax.tree_util.tree_leaves_with_path(v_hf):
        np.testing.assert_array_equal(leaf, flat_oa[path], err_msg=str(path))


def test_clip_preprocess_geometry():
    from fce_yolo_tpu.nn.clip_vision import clip_preprocess

    out = clip_preprocess(np.full((100, 300, 3), 128, np.uint8), size=64)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()


def test_fastsam_text_prompt_selects_one_region():
    """texts= routes through the CLIP pair and keeps exactly one region per
    query (reference _clip_inference contract; random-init towers here, so
    only the selection mechanics are asserted)."""
    from fce_yolo_tpu.models.fastsam import FastSAM
    from fce_yolo_tpu.nn.clip_vision import CLIPImageEncoder
    from fce_yolo_tpu.nn.text_model import CLIPTextEncoder

    fs = FastSAM.__new__(FastSAM)  # skip model build; exercise _text_prompt
    fs.clip_weights = None
    fs._clip = (CLIPTextEncoder(CFG), CLIPImageEncoder(_vision_cfg()))

    from fce_yolo_tpu.engine.results import Results

    img = np.random.RandomState(0).randint(0, 255, (80, 120, 3), np.uint8)
    boxes = np.array([[5, 5, 40, 40, 0.9, 0], [50, 10, 110, 70, 0.8, 0]], np.float32)
    masks = np.zeros((2, 80, 120), np.float32)
    masks[0, 5:40, 5:40] = 1
    masks[1, 10:70, 50:110] = 1
    r = Results(img, "t", {0: "object"}, boxes=boxes, masks=masks)
    out = fs._text_prompt(r, "a thing")
    assert len(out.boxes.cls) == 1
    assert np.asarray(out.masks.data).shape[0] == 1
