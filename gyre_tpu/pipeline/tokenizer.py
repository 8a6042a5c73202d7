"""CLIP BPE tokenizer (pure python) + deterministic fallback.

The reference gets tokenization from each engine's bundled HF tokenizer
files. We implement the CLIP byte-pair-encoding algorithm directly: a
tokenizer is constructed from the vocab.json + merges.txt that ship inside
a model's weight directory. For weight-less engines (random-init test/bench
models) `FallbackTokenizer` hashes words to stable ids so the full pipeline
stays exercisable end-to-end without downloads.
"""

from __future__ import annotations

import gzip
import html
import json
import os
from functools import lru_cache

import regex as re

BOS = 49406
EOS = 49407
VOCAB = 49408

_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text.strip()).lower()


class CLIPBPETokenizer:
    """Byte-level BPE with end-of-word markers, CLIP flavour."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 pad_token_id: int = EOS):
        self.encoder = vocab
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.cache: dict[str, list[int]] = {}
        self.bos = vocab.get("<|startoftext|>", BOS)
        self.eos = vocab.get("<|endoftext|>", EOS)
        self.pad = pad_token_id

    @classmethod
    def load(cls, path: str, pad_token_id: int | None = None):
        """Load from a directory holding vocab.json + merges.txt, an HF
        tokenizer dir, or a gzipped openai bpe file."""
        vpath = None
        for cand in ("vocab.json", "tokenizer/vocab.json"):
            if os.path.exists(os.path.join(path, cand)):
                vpath = os.path.join(path, cand)
                break
        if vpath:
            with open(vpath) as fh:
                vocab = json.load(fh)
            mpath = os.path.join(os.path.dirname(vpath), "merges.txt")
            with open(mpath) as fh:
                lines = fh.read().split("\n")
            merges = [tuple(l.split()) for l in lines
                      if l and not l.startswith("#version") and len(l.split()) == 2]
            pad = pad_token_id
            cfgp = os.path.join(os.path.dirname(vpath), "tokenizer_config.json")
            if pad is None and os.path.exists(cfgp):
                with open(cfgp) as fh:
                    tcfg = json.load(fh)
                pt = tcfg.get("pad_token")
                if isinstance(pt, dict):
                    pt = pt.get("content")
                pad = vocab.get(pt, EOS) if pt else EOS
            return cls(vocab, merges, pad if pad is not None else EOS)
        gz = os.path.join(path, "bpe_simple_vocab_16e6.txt.gz")
        if os.path.exists(gz):
            with gzip.open(gz, "rt", encoding="utf8") as fh:
                lines = fh.read().split("\n")
            merges = [tuple(l.split()) for l in lines[1:48895]]
            chars = list(_bytes_to_unicode().values())
            vocab_list = chars + [c + "</w>" for c in chars]
            vocab_list += ["".join(m) for m in merges]
            vocab_list += ["<|startoftext|>", "<|endoftext|>"]
            vocab = {t: i for i, t in enumerate(vocab_list)}
            return cls(vocab, merges, pad_token_id or 0)
        raise FileNotFoundError(f"no tokenizer files under {path}")

    def save(self, path: str):
        """Write vocab.json + merges.txt (HF tokenizer dir layout) so
        exported modelsets round-trip their tokenizer."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "vocab.json"), "w") as fh:
            json.dump(self.encoder, fh, ensure_ascii=False)
        merges = sorted(self.bpe_ranks.items(), key=lambda kv: kv[1])
        with open(os.path.join(path, "merges.txt"), "w") as fh:
            fh.write("#version: 0.2\n")
            for (a, b), _ in merges:
                fh.write(f"{a} {b}\n")
        with open(os.path.join(path, "tokenizer_config.json"), "w") as fh:
            json.dump({"pad_token": "<|endoftext|>"}, fh)

    def _bpe(self, token: str) -> list[str]:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        if not pairs:
            return [token + "</w>"]
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        return list(word)

    def encode(self, text: str) -> list[int]:
        """Token ids WITHOUT bos/eos (the prompt chunker adds them)."""
        if text in self.cache:
            return self.cache[text]
        ids: list[int] = []
        for tok in _PAT.findall(_clean(text)):
            btok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(btok):
                ids.append(self.encoder.get(piece, self.eos))
        self.cache[text] = ids
        return ids


class FallbackTokenizer:
    """Deterministic word-hash tokenizer for weight-less engines: stable,
    collision-sparse ids in [1000, 49000). Lets every pipeline/test path run
    without downloaded vocab files."""

    bos = BOS
    eos = EOS
    pad = EOS

    def encode(self, text: str) -> list[int]:
        import zlib

        ids = []
        for tok in _PAT.findall(_clean(text)):
            ids.append(1000 + (zlib.crc32(tok.encode()) % 48000))
        return ids


def load_tokenizer(path: str | None, pad_token_id: int | None = None):
    if path:
        try:
            return CLIPBPETokenizer.load(path, pad_token_id)
        except FileNotFoundError:
            pass
    return FallbackTokenizer()
