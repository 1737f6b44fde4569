"""Tokenizer round-trips, persistence, and metric correctness."""

import numpy as np
import pytest

from rnnt_tpu.data.tokenizer import (
    CharTokenizer, SubwordTokenizer, get_tokenizer, normalize_text)
from rnnt_tpu.metrics import accuracy, cer, edit_distance, error_rate, wer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    'HELLO world "this" is a test',
    "speech recognition with transducers",
    "the lazy dog sleeps all day",
    "hello hello hello world world",
    "quick quick brown brown fox",
] * 4


def test_normalize_text():
    assert normalize_text('Hello "World"') == "hello world"  # preprocessing.py:24-29


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    assert tok.vocab_size == 31  # vocabulary.py:1-6
    ids = tok.encode("Hello World")
    assert tok.decode(ids) == "hello world"
    assert 0 not in ids  # no blanks in real text
    assert tok.encode("a")[0] == 4  # '', ' ', <s>, </s>, then a


def test_char_tokenizer_save_load(tmp_path):
    tok = CharTokenizer()
    tok.save(str(tmp_path))
    tok2 = CharTokenizer.load(str(tmp_path))
    assert tok2.vocab == tok.vocab


def test_subword_build_encode_decode():
    tok = SubwordTokenizer.build_from_corpus(CORPUS, target_vocab_size=100)
    assert tok.pieces[0] == ""
    assert tok.vocab_size <= 100
    for text in ["the quick brown fox", "hello world", "lazy dog"]:
        ids = tok.encode(text)
        assert ids and all(i > 0 for i in ids)
        assert tok.decode(ids) == text
    # unseen-but-same-alphabet words still encodable via char fallback
    assert tok.decode(tok.encode("boxer")) == "boxer"


def test_subword_save_load(tmp_path):
    tok = SubwordTokenizer.build_from_corpus(CORPUS, target_vocab_size=64)
    tok.save(str(tmp_path))
    tok2 = SubwordTokenizer.load(str(tmp_path))
    assert tok2.pieces == tok.pieces
    assert tok2.encode("hello world") == tok.encode("hello world")


def test_get_tokenizer_build_or_load(tmp_path):
    t1 = get_tokenizer(str(tmp_path), "word-piece", 64, corpus=CORPUS)
    t2 = get_tokenizer(str(tmp_path), "word-piece", 64)  # loads persisted
    assert t1.pieces == t2.pieces
    assert isinstance(get_tokenizer(str(tmp_path), "character", 31), CharTokenizer)


# --- metrics (ref: utils/metrics.py) ---

def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


def test_error_rate_normalization():
    # normalized by max(len) — metrics.py:11,24
    assert error_rate("abcd", "ab") == 2 / 4
    assert error_rate("", "") == 0.0


def test_accuracy_and_wer():
    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello word"]
    assert accuracy(refs, hyps) < 1.0
    assert wer(refs, refs) == 0.0
    assert wer(refs, hyps) == 0.25  # 0 + 1/2 errors -> mean .25
    assert cer(["abc"], ["abd"]) == 1 / 3


def test_char_tokenizer_drops_oov():
    """OOV chars must be dropped, never mapped to blank id 0 (the reference's
    default_value=0 would corrupt the loss lattice)."""
    tok = CharTokenizer()
    ids = tok.encode("a1b,c!")
    assert 0 not in ids
    assert tok.decode(ids) == "abc"


def test_subword_escaping_roundtrip(tmp_path):
    """Pieces containing backslashes/newlines must survive save/load exactly."""
    pieces = ["", "a\\n", "b\\", "c\nd", "▁normal"]
    tok = SubwordTokenizer(pieces)
    tok.save(str(tmp_path))
    tok2 = SubwordTokenizer.load(str(tmp_path))
    assert tok2.pieces == pieces


def test_subword_truncation_keeps_alphabet():
    """vocab_size smaller than merges+alphabet drops merges, not the
    single-character fallback (any input stays encodable)."""
    tok = SubwordTokenizer.build_from_corpus(CORPUS, target_vocab_size=20)
    alphabet = sorted({c for line in CORPUS for c in
                       normalize_text(line).replace(" ", "")}) 
    for ch in alphabet:
        assert ch in tok.pieces, f"alphabet char {ch!r} was truncated"
    assert tok.decode(tok.encode("zebra qux")) == "zebra qux".replace("z","z")


def test_incremental_bpe_matches_rescan_oracle():
    """The incremental trainer (pair-count/occurrence indices + lazy heap)
    must be byte-identical to the full-rescan reference trainer."""
    import numpy as np

    a = SubwordTokenizer.build_from_corpus(CORPUS, 80)
    b = SubwordTokenizer._build_from_corpus_rescan(CORPUS, 80)
    assert a.pieces == b.pieces

    rng = np.random.default_rng(7)
    letters = list("abcdefghij")
    words = ["".join(rng.choice(letters, rng.integers(2, 9)))
             for _ in range(600)]
    corpus = [" ".join(rng.choice(words, 8)) for _ in range(300)]
    a = SubwordTokenizer.build_from_corpus(corpus, 256)
    b = SubwordTokenizer._build_from_corpus_rescan(corpus, 256)
    assert a.pieces == b.pieces


@pytest.mark.slow
def test_incremental_bpe_100k_words_under_a_minute():
    """4096-piece vocab from a >=100k-unique-word corpus in well under a
    minute (the rescan trainer needs hours at this scale)."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    alpha = list("abcdefghijklmnopqrstuvwxyz")
    words = set()
    while len(words) < 100_000:
        words.add("".join(rng.choice(alpha, rng.integers(3, 12))))
    words = sorted(words)
    zipf = rng.zipf(1.3, 300_000)
    zipf = zipf[zipf <= len(words)] - 1
    corpus = [" ".join(words[i] for i in zipf[k:k + 10])
              for k in range(0, len(zipf) - 10, 10)]
    t0 = time.time()
    tok = SubwordTokenizer.build_from_corpus(corpus, 4096)
    dt = time.time() - t0
    assert tok.vocab_size == 4096
    assert dt < 60, f"BPE build took {dt:.1f}s"
    # round-trips still hold at scale
    assert tok.decode(tok.encode(corpus[0])) == corpus[0]


def test_pad_vocab_to_target():
    """pad_to_target fills the vocab with reserved ids: full requested width
    for the joint softmax, but never encodable/decodable."""
    tok = SubwordTokenizer.build_from_corpus(CORPUS, 512, pad_to_target=True)
    assert tok.vocab_size == 512
    ids = tok.encode("hello world")
    assert all(not tok.pieces[i].startswith("\x00") for i in ids)
    # decode drops reserved ids instead of leaking sentinel text
    assert tok.decode(list(ids) + [511]) == tok.decode(ids)


def test_learn_vocab_size_caps_learned_pieces():
    """learn_vocab_size decouples piece granularity from joint width: the
    learned prefix is byte-identical to a plain build at that size, and the
    padded tail fills the requested vocab (the parity-campaign shape: fine
    pieces, V=4096 joint)."""
    small = SubwordTokenizer.build_from_corpus(CORPUS, 64)
    wide = SubwordTokenizer.build_from_corpus(
        CORPUS, 512, pad_to_target=True, learn_vocab_size=64)
    assert wide.vocab_size == 512
    assert wide.pieces[:small.vocab_size] == small.pieces
    assert all(p.startswith("\x00") for p in wide.pieces[small.vocab_size:])
    # encodings agree: the reserved tail never matches input text
    s = "hello world"
    assert list(wide.encode(s)) == list(small.encode(s))
    assert wide.decode(wide.encode(s)) == small.decode(small.encode(s))
