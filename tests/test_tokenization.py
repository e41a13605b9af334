"""Self-contained WordPiece tokenizer vs the HF BertTokenizer oracle
(both loaded from the same local vocab file — no downloads)."""

import os

import numpy as np
import pytest

from ant_quantization_tpu.harness import tokenization as T

VOCAB = """[PAD]
[UNK]
[CLS]
[SEP]
[MASK]
the
quick
brown
fox
jump
##s
##ed
##ing
over
lazy
dog
!
?
,
.
un
##aff
##able
##break
hello
world
2
##0
##00
va
##lid
##ation
中
国
"""


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text(VOCAB)
    return str(p)


SENTENCES = [
    "The quick brown fox jumps over the lazy dog!",
    "unbreakable, unaffable?",
    "hello world. HELLO WORLD.",
    "validation 2000",
    "中国 hello",
    "Héllo wörld",          # accents stripped -> hello world
    "totally-unknown gibberishzz",
]


def test_tokenize_matches_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    mine = T.WordPieceTokenizer(vocab_file, do_lower_case=True)
    for s in SENTENCES:
        assert mine.tokenize(s) == hf.tokenize(s), s


def test_batch_encode_matches_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    mine = T.WordPieceTokenizer(vocab_file, do_lower_case=True)
    a = ["the quick brown fox", "hello world"]
    b = ["jumps over the lazy dog", "validation 2000"]
    got = mine(a, b, padding="max_length", truncation=True, max_length=16)
    want = hf(a, b, padding="max_length", truncation=True, max_length=16)
    for key in ("input_ids", "token_type_ids", "attention_mask"):
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(want[key]), err_msg=key)


def test_single_text_truncation(vocab_file):
    mine = T.WordPieceTokenizer(vocab_file)
    enc = mine(["the quick brown fox jumps over the lazy dog"] * 2,
               None, max_length=6)
    ids = np.asarray(enc["input_ids"])
    assert ids.shape == (2, 6)
    assert (ids[:, 0] == mine.vocab["[CLS]"]).all()
    assert (ids[:, -1] == mine.vocab["[SEP]"]).all()
    assert np.asarray(enc["attention_mask"]).sum() == 12


def test_pair_truncation_longest_first(vocab_file):
    """Reference _truncate_seq_pair pops from the longer sequence."""
    mine = T.WordPieceTokenizer(vocab_file)
    a = "the quick brown fox jumps over the lazy dog"     # long
    b = "hello world"                                     # short
    enc = mine([a], [b], max_length=12)
    toks = mine.convert_ids_to_tokens(enc["input_ids"][0])
    # b survives whole; a is cut
    assert "hello" in toks and "world" in toks
    assert toks[0] == "[CLS]" and toks.count("[SEP]") == 2


def test_unknown_and_cjk(vocab_file):
    mine = T.WordPieceTokenizer(vocab_file)
    assert mine.tokenize("中国") == ["中", "国"]
    assert mine.tokenize("qqqqzzzz") == ["[UNK]"]


def test_load_tokenizer_from_bare_vocab(vocab_file):
    tok = T.load_tokenizer(vocab_file)
    assert isinstance(tok, T.WordPieceTokenizer)
    enc = tok(["hello world"], None, max_length=8)
    assert len(enc["input_ids"][0]) == 8


def test_offsets_recover_source_spans(vocab_file):
    tok = T.WordPieceTokenizer(vocab_file)
    text = "The quick brown fox Jumped over 2000 dogs!"
    tokens, offs = T.tokenize_with_offsets(text, tok.vocab)
    assert tokens == tok.tokenize(text)
    for t, (a, b) in zip(tokens, offs):
        src = text[a:b].lower()
        if t.startswith("##"):
            assert src == t[2:], (t, src)
        elif t != "[UNK]":
            assert src == t, (t, src)


def test_qa_encoding_matches_hf_fast(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizerFast(vocab_file=vocab_file,
                                        do_lower_case=True)
    mine = T.WordPieceTokenizer(vocab_file)
    question = "the fox?"
    context = ("the quick brown fox jumped over the lazy dog . " * 4
               + "hello world validation 2000 .")
    kw = dict(truncation="only_second", max_length=24, stride=4,
              return_overflowing_tokens=True, return_offsets_mapping=True,
              padding="max_length")
    got = mine(question, context, **kw)
    want = hf(question, context, **kw)
    assert len(got["input_ids"]) == len(want["input_ids"])
    for fi in range(len(got["input_ids"])):
        np.testing.assert_array_equal(got["input_ids"][fi],
                                      want["input_ids"][fi])
        np.testing.assert_array_equal(got["attention_mask"][fi],
                                      want["attention_mask"][fi])
        assert got.sequence_ids(fi) == want.sequence_ids(fi)
        # context-token offsets must agree (specials/question are masked
        # to None by prepare_features before use)
        for k, sid in enumerate(got.sequence_ids(fi)):
            if sid == 1:
                assert tuple(got["offset_mapping"][fi][k]) == tuple(
                    want["offset_mapping"][fi][k])


def test_qa_features_flow(vocab_file):
    """prepare_features runs end-to-end on the fallback tokenizer."""
    from ant_quantization_tpu.harness import qa_utils as Q
    mine = T.WordPieceTokenizer(vocab_file)
    examples = [{"id": "q1", "question": "the fox?",
                 "context": "the quick brown fox jumped over the lazy dog",
                 "answers": ["fox"], "is_impossible": False}]
    feats = Q.prepare_features(examples, mine, max_seq_length=32)
    assert feats and feats[0]["input_ids"].shape == (32,)
    offs = feats[0]["offset_mapping"]
    ctx = examples[0]["context"]
    spans = [ctx[a:b] for o in offs if o is not None for a, b in [o]]
    assert "fox" in spans


def test_blank_vocab_line_ids_match_hf(tmp_path):
    """A vocab.txt with an interior blank line: HF assigns ids by line
    number (the blank costs a slot); ours must agree."""
    transformers = pytest.importorskip("transformers")
    p = tmp_path / "vocab.txt"
    p.write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\n\nworld\nfoo\n")
    hf = transformers.BertTokenizer(vocab_file=str(p))
    mine = T.WordPieceTokenizer(str(p))
    for tok in ("hello", "world", "foo", "[SEP]"):
        assert mine.vocab[tok] == hf.vocab[tok], tok
