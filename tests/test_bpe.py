"""CLIP byte-level BPE tokenizer (nn/bpe.py) — merge semantics against
hand-computed expectations on constructed mini-vocabs, openai/HF vocab-file
loading, the tokenize() contract (SOT/EOT/pad/truncate), and integration
with CLIPTextEncoder. Golden parity vs a real CLIP tokenizer runs when
local tokenizer files exist (they don't in this offline env -> skipped)."""

import gzip
import json

import numpy as np
import pytest

from fce_yolo_tpu.nn.bpe import (
    CLIPBPETokenizer,
    EOT_TEXT,
    SOT_TEXT,
    bytes_to_unicode,
)

MERGES = [("h", "e"), ("he", "l"), ("l", "o</w>"), ("w", "o"), ("e", "r</w>")]


def mini():
    return CLIPBPETokenizer(merges=MERGES, context_length=16)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("a")] == "a"  # printable ASCII maps to itself
    assert all(isinstance(v, str) and len(v) == 1 for v in m.values())


def test_merge_semantics_hand_computed():
    tk = mini()
    # 'hello' -> he + l -> hel, l+o</w> -> lo</w>  => "hel lo</w>"
    unit = "hello"
    assert tk.bpe(unit) == "hel lo</w>"
    # merged-token ids sit after the 512 byte/byte</w> units, in merge order
    assert tk.encoder["he"] == 512
    assert tk.encoder["hel"] == 513
    assert tk.encoder["lo</w>"] == 514
    assert tk.encode("hello") == [513, 514]
    # case-insensitive + cleaning: same ids
    assert tk.encode("  HeLLo ") == [513, 514]
    # un-merged word falls back to byte units with terminal </w>
    xy = tk.encode("xy")
    assert xy == [tk.encoder["x"], tk.encoder["y</w>"]]


def test_regex_splitting_contractions_digits():
    tk = mini()
    # CLIP pattern: "isn't" -> ["isn", "'t"]; digits split one at a time
    toks = [m for m in tk.pat.findall("isn't 42")]
    assert toks == ["isn", "'t", "4", "2"]


def test_special_tokens_never_split():
    tk = mini()
    ids = tk.encode(f"{SOT_TEXT} hello {EOT_TEXT}")
    assert ids[0] == tk.sot_id and ids[-1] == tk.eot_id
    assert ids[1:-1] == [513, 514]


def test_tokenize_contract():
    tk = mini()
    out = tk.tokenize(["hello", "hello hello hello"])
    assert out.shape == (2, 16) and out.dtype == np.int32
    assert out[0, 0] == tk.sot_id
    assert out[0, 3] == tk.eot_id  # sot, hel, lo</w>, eot
    assert out[0, 4:].sum() == 0  # zero padding
    # truncation keeps EOT in the last slot
    long = " ".join(["hello"] * 40)
    row = tk.tokenize([long])[0]
    assert row[-1] == tk.eot_id and row[0] == tk.sot_id
    with pytest.raises(RuntimeError):
        tk.tokenize([long], truncate=False)


def test_unicode_roundtrip():
    tk = mini()
    for text in ["héllo wörld", "机械臂 抓取", "emoji 🙂 ok"]:
        ids = tk.encode(text)
        assert all(isinstance(i, int) for i in ids)
        # byte-level decode reproduces the cleaned lowercase text
        assert tk.decode(ids) == " ".join(text.lower().split())


def test_decode_inverse():
    tk = mini()
    assert tk.decode(tk.encode("hello lower")) == "hello lower"


def test_openai_vocab_file_loading(tmp_path):
    """openai layout: version header line, one merge per line; vocab built
    as 256 byte units + 256 </w> units + merges + 2 specials."""
    body = "#version: clip-mini\n" + "\n".join(f"{a} {b}" for a, b in MERGES)
    txt = tmp_path / "vocab.txt"
    txt.write_text(body)
    gz = tmp_path / "vocab.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write(body)
    for path in (txt, gz):
        tk = CLIPBPETokenizer(str(path), context_length=8)
        assert tk.encode("hello") == [513, 514]
        assert tk.sot_id == 512 + len(MERGES) and tk.eot_id == tk.sot_id + 1


def test_hf_dir_loading(tmp_path):
    """HF layout: merges.txt + vocab.json mapping token -> id."""
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES)
    )
    vocab = {v: i for i, v in enumerate(bytes_to_unicode().values())}
    for v in list(bytes_to_unicode().values()):
        vocab[v + "</w>"] = len(vocab)
    for a, b in MERGES:
        vocab[a + b] = len(vocab)
    vocab[SOT_TEXT] = len(vocab)
    vocab[EOT_TEXT] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    tk = CLIPBPETokenizer(str(tmp_path), context_length=8)
    assert tk.encode("hello") == [vocab["hel"], vocab["lo</w>"]]
    assert tk.eot_id == vocab[EOT_TEXT]


def test_clip_text_encoder_uses_bpe(tmp_path, monkeypatch):
    """CLIPTextEncoder routes tokenize() through the BPE when a vocab path
    is supplied (explicitly or via FY_CLIP_VOCAB)."""
    body = "#version: clip-mini\n" + "\n".join(f"{a} {b}" for a, b in MERGES)
    path = tmp_path / "vocab.txt"
    path.write_text(body)
    from fce_yolo_tpu.nn.text_model import CLIPTextCfg, CLIPTextEncoder

    cfg = CLIPTextCfg(width=32, heads=2, layers=1, proj=16, ctx=16)
    enc = CLIPTextEncoder(cfg, vocab=str(path))
    toks = enc.tokenize(["hello"])
    assert toks.shape == (1, 16)
    assert toks[0, 1] == 513 and toks[0, 2] == 514
    feats = enc.encode_text(toks)
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-4)
    # env-var discovery path (sam3.hash_tokenize upgrade)
    monkeypatch.setenv("FY_CLIP_VOCAB", str(path))
    from fce_yolo_tpu.models.sam3 import hash_tokenize

    out = hash_tokenize(["hello"], context_length=8)
    assert out[0, 1] == 513 and out[0, 2] == 514


def test_golden_vs_real_clip_tokenizer():
    """Bit-parity vs a locally-present real CLIP tokenizer (openai vocab or
    HF files). Skipped in this offline environment."""
    import os

    vocab = os.environ.get("FY_CLIP_VOCAB_FULL")
    if not vocab:
        pytest.skip("no full CLIP vocab file in this environment")
    try:
        from transformers import CLIPTokenizerFast

        ref = CLIPTokenizerFast.from_pretrained(
            "openai/clip-vit-base-patch32", local_files_only=True
        )
    except Exception:
        pytest.skip("no local transformers CLIP tokenizer files")
    tk = CLIPBPETokenizer(vocab, context_length=77)
    texts = ["a photo of a cat", "robotic arm grasping a square workpiece"]
    ours = tk.tokenize(texts)
    theirs = ref(texts, padding="max_length", max_length=77, truncation=True,
                 return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(ours, theirs.astype(np.int32))
