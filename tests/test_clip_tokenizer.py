"""CLIP BPE tokenizer goldens vs the reference's vendored tokenizer
(basicsr/models/clip/simple_tokenizer.py) using its shipped vocab file."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from tests.conftest import requires_reference

REF_TOKENIZER = "/root/reference/basicsr/models/clip/simple_tokenizer.py"
REF_VOCAB = "/root/reference/basicsr/models/clip/bpe_simple_vocab_16e6.txt.gz"

CORPUS = [
    "X X X.",                                  # the PANet PromptLearner template
    "a photo of a cat",
    "A blurry photo, restored!",
    "it's 2024: we've got 3 GPUs... don't we?",
    "low-light image denoising (sigma=25)",
    "café naïve résumé",   # accented letters
    "hello<|endoftext|>world",                 # special token mid-string
    "  spaces\tand\nnewlines  collapse ",
    "100,000 iterations @ 1e-4 lr",
    "don't stop believin'",
    "¿qué tal? él dijo 'hola'",
]


@pytest.fixture(scope="module")
def ref_tokenizer():
    # The reference module imports ftfy, which this image lacks; its only use
    # is mojibake repair, identity on well-formed text, so stub it.
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer",
                                                  REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(REF_VOCAB)


@pytest.fixture(scope="module")
def our_tokenizer():
    from nlc_tpu.restoration.clip_tokenizer import ClipTokenizer
    return ClipTokenizer(REF_VOCAB)


@requires_reference
def test_encode_matches_reference(ref_tokenizer, our_tokenizer):
    for text in CORPUS:
        assert our_tokenizer.encode(text) == ref_tokenizer.encode(text), text


@requires_reference
def test_encode_matches_reference_fuzz(ref_tokenizer, our_tokenizer):
    """Seeded fuzz: random byte soup, unicode planes, long repeats, and
    random word salads from the vocab itself must all tokenize id-for-id."""
    rng = np.random.RandomState(0)
    words = list(our_tokenizer.encoder)[:5000:7]
    for i in range(200):
        kind = i % 4
        if kind == 0:       # printable-ascii soup
            n = rng.randint(1, 80)
            s = "".join(chr(rng.randint(32, 127)) for _ in range(n))
        elif kind == 1:     # random unicode code points (BMP, skip surrogates)
            n = rng.randint(1, 40)
            cps = rng.randint(0x20, 0xD7FF, size=n)
            s = "".join(chr(c) for c in cps)
        elif kind == 2:     # pathological repeats
            unit = ["a", "ab", " ", "é", "0", "!?", "<|"][i % 7]
            s = unit * rng.randint(1, 60)
        else:               # vocab-word salad with random casing
            k = rng.randint(1, 12)
            ws = [words[rng.randint(len(words))].replace("</w>", "")
                  for _ in range(k)]
            s = " ".join(w.upper() if rng.rand() < 0.3 else w for w in ws)
        assert our_tokenizer.encode(s) == ref_tokenizer.encode(s), repr(s)


@requires_reference
def test_vocab_matches_reference(ref_tokenizer, our_tokenizer):
    assert our_tokenizer.encoder == ref_tokenizer.encoder
    assert our_tokenizer.sot_id == ref_tokenizer.encoder["<|startoftext|>"]
    assert our_tokenizer.eot_id == ref_tokenizer.encoder["<|endoftext|>"]


@requires_reference
def test_decode_round_trip(ref_tokenizer, our_tokenizer):
    for text in CORPUS:
        ids = our_tokenizer.encode(text)
        assert our_tokenizer.decode(ids) == ref_tokenizer.decode(ids)


def test_scanner_matches_regex_splitter():
    """The stdlib fallback word scanner must agree with the regex-based
    splitter (the regex package is present in this image, so both run)."""
    import nlc_tpu.restoration.clip_tokenizer as ct
    if ct._regex is None:
        pytest.skip("regex package unavailable; nothing to cross-check")

    def scan(text):
        saved, ct._regex = ct._regex, None
        try:
            return ct.split_words(text)
        finally:
            ct._regex = saved

    for text in CORPUS + ["<|startoftext|>abc<|endoftext|>", "x'll y'd z're"]:
        cleaned = ct.normalize_text(text).lower()
        assert scan(cleaned) == ct.split_words(cleaned), text


@requires_reference
def test_tokenize_batch_contract(our_tokenizer):
    """clip.tokenize parity: SOT/EOT framing, zero padding, too-long error,
    truncate flag (clip.py:185-221)."""
    toks = our_tokenizer.tokenize(["a photo of a cat", "X X X."])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] == our_tokenizer.sot_id).all()
    row = toks[0]
    eot_pos = int(np.argmax(row))
    assert row[eot_pos] == our_tokenizer.eot_id
    assert (row[eot_pos + 1:] == 0).all()

    long = "word " * 200
    with pytest.raises(RuntimeError):
        our_tokenizer.tokenize(long)
    trunc = our_tokenizer.tokenize(long, truncate=True)[0]
    assert trunc[-1] == our_tokenizer.eot_id and len(trunc) == 77


@requires_reference
def test_prompt_rows_match_template_baking(our_tokenizer):
    """prompt_rows reproduces the PromptLearner's prefix/suffix slicing
    (PANet_arch.py:93-101) for the stock template, from raw text."""
    from nlc_tpu.restoration.clip_tokenizer import prompt_rows
    rng = np.random.default_rng(0)
    table = rng.standard_normal((49408, 16)).astype(np.float32)
    n_ctx = 3
    ids = our_tokenizer.tokenize("X X X.")[0]
    emb = table[ids]
    prefix, suffix, eot_idx = prompt_rows(our_tokenizer, "X X X.", table, n_ctx)
    np.testing.assert_array_equal(prefix, emb[:1])
    np.testing.assert_array_equal(suffix, emb[1 + n_ctx:])
    # "X X X." = SOT, X, X, X, ".", EOT -> argmax at position n_ctx + 2
    assert eot_idx == n_ctx + 2
