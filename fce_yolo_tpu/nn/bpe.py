"""CLIP byte-level BPE tokenizer (offline, dependency-free).

The reference's open-vocab paths tokenize with openai-``clip``'s
SimpleTokenizer (reference ``ultralytics/nn/text_model.py:95`` ->
``clip.tokenize``; MobileCLIP variant ``:227``). That algorithm is
implemented here from its published semantics so real CLIP text encoding is
one *vocab file* away (the merges table is download-gated in this
environment, exactly like checkpoint weights — pass a local path, e.g. the
openai ``bpe_simple_vocab_16e6.txt.gz`` or a HuggingFace tokenizer dir with
``merges.txt``/``vocab.json``).

Semantics mirrored exactly:

- byte->unicode mapping over all 256 byte values (printable bases, 256+n
  escapes) so arbitrary UTF-8 round-trips through the string-keyed vocab;
- the CLIP token-splitting regex (contractions, letter runs, single digits,
  punctuation runs) with IGNORECASE — the ``regex`` module supports the
  original ``\\p{L}``/``\\p{N}`` classes verbatim;
- word-terminal ``</w>`` marker on the last byte-unit of every word;
- iterative lowest-rank bigram merging over the ranked merges table;
- vocab = 256 byte units + 256 word-final units + one token per merge +
  ``<|startoftext|>``/``<|endoftext|>`` (openai layout; 49152-256-2 merges
  -> 49408 entries), or a HF ``vocab.json`` mapping when given;
- ``tokenize()``: SOT + ids + EOT padded with 0 to the context length;
  over-length prompts truncate with EOT kept in the last slot (reference
  ``truncate=True`` default) or raise.

Text cleaning: ``html.unescape`` (twice) + whitespace collapse + lowercase.
openai additionally runs ``ftfy.fix_text`` (mojibake repair); ftfy does not
exist in this environment, so already-clean text tokenizes identically and
mojibake inputs are passed through as-is.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
from pathlib import Path

import numpy as np

__all__ = ["CLIPBPETokenizer", "bytes_to_unicode", "find_local_vocab"]

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
# openai merges-table slice: lines [1, 49152-256-2+1) of the vocab file
OPENAI_N_MERGES = 49152 - 256 - 2


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict:
    """Bijective byte -> unicode-char map (openai byte-level BPE base)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: tuple) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split())


def find_local_vocab() -> str | None:
    """Discover a local CLIP vocab: ``FY_CLIP_VOCAB`` env var, else None."""
    p = os.environ.get("FY_CLIP_VOCAB", "")
    return p if p and Path(p).exists() else None


class CLIPBPETokenizer:
    """openai-CLIP SimpleTokenizer reimplementation.

    Parameters
    ----------
    vocab_path:
        Either an openai merges file (``*.txt`` / ``*.txt.gz``: version
        header line then one space-separated merge pair per line) or a
        HuggingFace tokenizer directory / ``merges.txt`` path (with an
        optional sibling ``vocab.json`` used as the id mapping).
    merges:
        Direct list of (first, second) merge pairs — offline mini-vocab
        construction for tests; the vocab is built the openai way from the
        byte units + these merges.
    context_length:
        Output width of :meth:`tokenize` (reference: 77).
    """

    def __init__(self, vocab_path: str | None = None,
                 merges: list | None = None, context_length: int = 77):
        if (vocab_path is None) == (merges is None):
            raise ValueError("pass exactly one of vocab_path= or merges=")
        self.context_length = int(context_length)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        encoder = None
        if vocab_path is not None:
            merges, encoder = self._load(Path(vocab_path))
        merges = [tuple(m) for m in merges]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        if encoder is None:
            vocab = list(self.byte_encoder.values())
            vocab += [v + "</w>" for v in vocab]
            vocab += ["".join(m) for m in merges]
            vocab += [SOT_TEXT, EOT_TEXT]
            encoder = {tok: i for i, tok in enumerate(vocab)}
        self.encoder = encoder
        self.decoder = {i: tok for tok, i in encoder.items()}
        self.sot_id = encoder[SOT_TEXT]
        self.eot_id = encoder[EOT_TEXT]
        # special tokens never enter the merge loop
        self.cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}
        import regex  # exact CLIP pattern; stdlib `re` lacks \p classes

        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    @staticmethod
    def _load(path: Path) -> tuple[list, dict | None]:
        """Load (merges, encoder-or-None) from an openai file or a HF dir."""
        if path.is_dir():
            merges_file, vocab_json = path / "merges.txt", path / "vocab.json"
        elif path.name == "merges.txt":
            merges_file, vocab_json = path, path.with_name("vocab.json")
        else:  # openai single-file format (.txt / .txt.gz)
            opener = gzip.open if path.suffix == ".gz" else open
            with opener(path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            rows = [ln for ln in lines[1:] if len(ln.split()) == 2]
            return [tuple(ln.split()) for ln in rows[:OPENAI_N_MERGES]], None
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        start = 1 if lines and lines[0].startswith("#") else 0
        merges = [tuple(ln.split()) for ln in lines[start:] if len(ln.split()) == 2]
        encoder = None
        if vocab_json.exists():
            with open(vocab_json, encoding="utf-8") as f:
                encoder = {k: int(v) for k, v in json.load(f).items()}
            for tok in (SOT_TEXT, EOT_TEXT):
                encoder.setdefault(tok, len(encoder))
        return merges, encoder

    def bpe(self, token: str) -> str:
        """Merge the byte-unit string per ranked bigrams; returns the
        space-joined subword sequence (last unit carries ``</w>``)."""
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list:
        ids: list = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self.pat.findall(text):
            unit = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            for sub in self.bpe(unit).split(" "):
                try:
                    ids.append(self.encoder[sub])
                except KeyError:
                    # match the reference tokenizer's KeyError (simple_tokenizer
                    # raises on OOV); a silent EOT here would corrupt CLIP's
                    # argmax EOT-position pooling. Only reachable with an
                    # incomplete vocab.json.
                    raise KeyError(
                        f"subword {sub!r} not in BPE vocab (incomplete vocab.json?)")
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def tokenize(self, texts, context_length: int | None = None,
                 truncate: bool = True) -> np.ndarray:
        """(B, context_length) int32 token matrix: SOT + ids + EOT, 0-padded.

        Reference contract: ``clip.tokenize(texts, truncate=True)`` — long
        prompts are clipped with EOT preserved in the final slot; with
        ``truncate=False`` an over-length prompt raises.
        """
        if isinstance(texts, str):
            texts = [texts]
        ctx = int(context_length or self.context_length)
        out = np.zeros((len(texts), ctx), np.int32)
        for i, text in enumerate(texts):
            row = [self.sot_id, *self.encode(str(text)), self.eot_id]
            if len(row) > ctx:
                if not truncate:
                    raise RuntimeError(
                        f"input {text!r} is too long for context length {ctx}"
                    )
                row = row[:ctx]
                row[-1] = self.eot_id
            out[i, : len(row)] = row
        return out
