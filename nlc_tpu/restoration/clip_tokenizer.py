"""CLIP byte-level BPE tokenizer — novel-prompt support for PANet.

Rebuilds the reference's vendored tokenizer
(basicsr/models/clip/simple_tokenizer.py:62-131) and the ``clip.tokenize``
batching wrapper (basicsr/models/clip/clip.py:185-221) from scratch, so
PANet prompts are no longer limited to the fixed "X X X." template whose
embeddings were baked in at checkpoint conversion: any template can be
tokenized and embedded through the CLIP token-embedding table
(see ``prompt_rows``).

The vocab file (``bpe_simple_vocab_16e6.txt.gz``, ~1.3 MB gzip of
space-separated merge pairs) is user-supplied — the reference downloads the
CLIP checkpoint at runtime (PANet_arch.py:26-40), which a zero-egress
deployment cannot; pass the path explicitly or drop the file next to this
module.

Everything here is host-side Python (tokenization happens once per prompt
set, never inside jit); the output ids feed a gather over the token
embedding table, which is device code.
"""
from __future__ import annotations

import gzip
import html
import os
import unicodedata
from typing import List, Sequence, Union

import numpy as np

# The word-splitting pattern needs unicode-category classes (\p{L}, \p{N});
# the `regex` package provides them directly. A pure-stdlib scanner below
# mirrors the same alternation order for environments without it.
try:  # pragma: no cover - availability depends on the image
    import regex as _regex
except Exception:  # pragma: no cover
    _regex = None

try:  # pragma: no cover - optional mojibake fixer, absent in this image
    import ftfy as _ftfy
except Exception:  # pragma: no cover
    _ftfy = None

_WORD_PATTERN = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                 r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")
_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
_SPECIALS = ("<|startoftext|>", "<|endoftext|>")

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"


def byte_unicode_table() -> dict:
    """The GPT-2 byte -> printable-unicode bijection.

    BPE merges operate on strings, so raw bytes are remapped onto 256
    printable code points: the three printable latin ranges keep their own
    identity, everything else is displaced past U+0100 in order of discovery
    (simple_tokenizer.py:16-35 — a published constant table, reproduced from
    its definition).
    """
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    table = {b: chr(b) for b in keep}
    displaced = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + displaced)
            displaced += 1
    return table


def _is_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


def _is_number(ch: str) -> bool:
    return unicodedata.category(ch).startswith("N")


def split_words(text: str) -> List[str]:
    """Split text into BPE word units, matching the reference pattern's
    leftmost-first alternation (simple_tokenizer.py:78): specials,
    contraction suffixes, letter runs, single numerals, punctuation runs;
    whitespace separates and is dropped.
    """
    if _regex is not None:
        return _regex.findall(_WORD_PATTERN, text, _regex.IGNORECASE)
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        matched = None
        low = text[i:i + 15].lower()
        for sp in _SPECIALS:
            if low.startswith(sp):
                matched = text[i:i + len(sp)]
                break
        if matched is None and ch == "'":
            for suf in _CONTRACTIONS:
                if low.startswith(suf):
                    matched = text[i:i + len(suf)]
                    break
        if matched is None and _is_letter(ch):
            j = i + 1
            while j < n and _is_letter(text[j]):
                j += 1
            matched = text[i:j]
        if matched is None and _is_number(ch):
            matched = ch
        if matched is None and not ch.isspace():
            j = i + 1
            while j < n and not (text[j].isspace() or _is_letter(text[j])
                                 or _is_number(text[j])):
                j += 1
            matched = text[i:j]
        if matched is None:  # whitespace
            i += 1
        else:
            out.append(matched)
            i += len(matched)
    return out


def normalize_text(text: str) -> str:
    """The reference's clean-up (simple_tokenizer.py:50-59): mojibake fix
    (identity when ftfy is unavailable — exact for well-formed input),
    double HTML-unescape, whitespace collapse, strip."""
    if _ftfy is not None:
        text = _ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    text = " ".join(text.split())
    return text.strip()


class ClipTokenizer:
    """Byte-level BPE over the 49,408-entry CLIP vocabulary.

    The vocab file is a gzip of newline-separated merge pairs; entry layout
    (simple_tokenizer.py:66-77): 512 byte symbols (plain + '</w>' word-end
    variants), 48,894 merges, 2 specials.
    """

    def __init__(self, vocab_path: str):
        self._byte_enc = byte_unicode_table()
        self._byte_dec = {c: b for b, c in self._byte_enc.items()}
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(ln.split()) for ln in lines[1:49152 - 256 - 2 + 1]]
        self._rank = {pair: r for r, pair in enumerate(merges)}
        symbols = list(self._byte_enc.values())
        symbols += [s + "</w>" for s in symbols]
        symbols += ["".join(p) for p in merges]
        symbols += list(_SPECIALS)
        self.encoder = {s: i for i, s in enumerate(symbols)}
        self.decoder = {i: s for s, i in self.encoder.items()}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._cache = {sp: (sp,) for sp in _SPECIALS}

    def _merge(self, token: str) -> tuple:
        """Apply BPE merges to one word (already byte-remapped). Greedy
        lowest-rank pair first, merging every left-to-right occurrence per
        round (simple_tokenizer.py:80-119)."""
        hit = self._cache.get(token)
        if hit is not None:
            return hit
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            pairs = set(zip(parts, parts[1:]))
            best = min(pairs, key=lambda p: self._rank.get(p, 1 << 60))
            if best not in self._rank:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        result = tuple(parts)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (no SOT/EOT), matching simple_tokenizer.encode."""
        ids: List[int] = []
        for word in split_words(normalize_text(text).lower()):
            mapped = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._merge(mapped))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytes(self._byte_dec[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts: Union[str, Sequence[str]],
                 context_length: int = 77, truncate: bool = False) -> np.ndarray:
        """Batch SOT+ids+EOT into a zero-padded (N, context_length) int array
        (clip.py:185-221 contract, including the too-long RuntimeError)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int64)
        for row, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(
                        f"Input {text!r} is too long for context length "
                        f"{context_length}")
                ids = ids[:context_length - 1] + [self.eot_id]
            out[row, :len(ids)] = ids
        return out


def default_vocab_path() -> str:
    """Vocab search: env var, then alongside this module."""
    env = os.environ.get("NLC_CLIP_BPE_VOCAB")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bpe_simple_vocab_16e6.txt.gz")


def prompt_rows(tokenizer: "ClipTokenizer", template: str,
                token_embedding: np.ndarray, n_ctx: int,
                context_length: int = 77):
    """Build PromptLearner prefix/suffix embeddings for an arbitrary template.

    The reference bakes these from the fixed "X X X." prompt at model build
    (PANet_arch.py:66-101: token_prefix = embedding[:, :1], token_suffix =
    embedding[:, 1+n_ctx:]); with the tokenizer in hand any template works.
    Returns (prefix (1, ctx_dim) row expanded later, suffix rows, eot_idx) as
    numpy — host-side, feeds the flax PANet params directly.
    """
    ids = tokenizer.tokenize(template, context_length)[0]
    emb = np.asarray(token_embedding)[ids]           # (L, ctx_dim)
    prefix = emb[:1]                                 # SOT row
    suffix = emb[1 + n_ctx:]                         # ".", EOT, padding rows
    eot_idx = int(np.argmax(ids))
    return prefix, suffix, eot_idx
