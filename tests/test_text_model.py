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
