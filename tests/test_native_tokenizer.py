"""Native C++ tokenizer: exact parity with the Python implementation."""

import os

import pytest

from financial_rag_system_tpu.models.tokenizer import (
    HashVocab,
    Tokenizer,
    WordPieceVocab,
    _basic_tokenize,
)
from financial_rag_system_tpu.native.loader import load_native_tokenizer

TRICKY = [
    "Apple reported record revenue in Q4 2023.",
    "UPPER lower MiXeD  multiple   spaces",
    "punct!@#$%^&*()_+-=[]{}|;:'\",.<>?/~`",
    "tabs\tand\nnewlines\r\nhandled",
    "a" * 300 + " longword" + "x" * 120,
    "numbers 123,456.78 and 9.5% growth",
    "hyphen-ated co-op e.g. U.S.A.",
    "",
    "   ",
    "x",
]


def _python_ids(tok: Tokenizer, text: str) -> list[int]:
    # force the pure-Python path regardless of native availability
    ids = []
    for word in _basic_tokenize(text):
        ids.extend(tok.vocab.token_ids(word))
    return ids


@pytest.fixture(scope="module")
def native_hash():
    nat = load_native_tokenizer(vocab_size=30522, piece_len=4)
    if nat is None:
        pytest.skip("native tokenizer unavailable (no g++?)")
    return nat


def test_hash_parity(native_hash):
    tok = Tokenizer(HashVocab())
    for text in TRICKY:
        assert native_hash.tokenize_ids(text) == _python_ids(tok, text), text


def test_wordpiece_parity(tmp_path):
    vocab_words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "apple", "report", "##ed",
        "record", "revenue", "in", "q4", "2023", ".", "re", "##ven", "##ue",
        "grow", "##th",
    ]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab_words) + "\n")
    nat = load_native_tokenizer(vocab_path=str(p))
    if nat is None:
        pytest.skip("native tokenizer unavailable")
    tok = Tokenizer(WordPieceVocab(str(p)))
    for text in [
        "apple reported record revenue in q4 2023.",
        "revenue growth",
        "unknownword apple",
        "apple!revenue",
    ]:
        assert nat.tokenize_ids(text) == _python_ids(tok, text), text


def test_tokenizer_uses_native_for_ascii():
    tok = Tokenizer(HashVocab())
    text = "Apple revenue grew in the quarter"
    ids = tok.tokenize_ids(text)
    assert ids == _python_ids(tok, text)
    # non-ascii falls back to Python (accent stripping)
    ids_acc = tok.tokenize_ids("résumé café")
    assert ids_acc == _python_ids(tok, "resume cafe")


def test_native_speedup(native_hash):
    import time

    tok = Tokenizer(HashVocab())
    tok._native = None  # force python
    tok._native_tried = True
    text = "the quick brown fox jumps over the lazy dog " * 20
    t0 = time.time()
    for _ in range(200):
        _python_ids(tok, text)
    py = time.time() - t0
    t0 = time.time()
    for _ in range(200):
        native_hash.tokenize_ids(text)
    nat = time.time() - t0
    assert nat < py  # native must at least beat uncached python
