"""Byte-level BPE tokenizer vs the true GPT-2 regex and the HF slow
tokenizer built from the same (tiny) vocab/merges files."""

import json

import pytest

from ant_quantization_tpu.harness import bpe as B

TEXTS = [
    "Hello world",
    "Hello, world! It's a test.",
    "  leading and   multiple   spaces",
    "trailing spaces   ",
    "numbers 123 and mixed abc123 def",
    "don't can't we'll I'm you're they've she'd it's",
    "line\nbreaks\n\nand\ttabs",
    "unicode: café naïve 中文 🙂",
    "a 'quoted' string and ''double''",
    "x",
    " ",
    "",
    "price: $4.99 (50% off!)",
]


def test_pretokenize_matches_gpt2_regex():
    regex = pytest.importorskip("regex")
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""
        r"""|\s+(?!\S)|\s+""")
    for text in TEXTS:
        assert B.pretokenize(text) == pat.findall(text), repr(text)


def test_bytes_to_unicode_reversible():
    m = B.bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("A")] == "A" and m[ord(" ")] == "Ġ"


@pytest.fixture()
def tok_files(tmp_path):
    """A tiny but structurally valid GPT-2 vocab: full byte alphabet plus
    a few merges."""
    byte_alpha = list(B.bytes_to_unicode().values())
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("o", "w"),
              ("Ġ", "w"), ("Ġw", "ow"), ("1", "2"), ("hell", "o")]
    vocab = {}
    for i, ch in enumerate(byte_alpha):
        vocab[ch] = i
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab))
    mf.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(vf), str(mf)


def test_matches_hf_gpt2_tokenizer(tok_files):
    transformers = pytest.importorskip("transformers")
    vf, mf = tok_files
    hf = transformers.GPT2Tokenizer(vocab_file=vf, merges_file=mf)
    mine = B.BPETokenizer(vf, mf)
    for text in TEXTS:
        assert mine.tokenize(text) == hf.tokenize(text), repr(text)
        assert mine.encode(text) == hf.encode(text), repr(text)


def test_roundtrip(tok_files):
    vf, mf = tok_files
    tok = B.BPETokenizer(vf, mf)
    for text in TEXTS:
        assert tok.decode(tok.encode(text)) == text, repr(text)


def test_call_api(tok_files):
    vf, mf = tok_files
    tok = B.BPETokenizer(vf, mf)
    enc = tok("hello world")
    assert isinstance(enc["input_ids"], list)
    enc2 = tok(["hello", "world"])
    assert len(enc2["input_ids"]) == 2
