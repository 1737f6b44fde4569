"""Character vocabulary (ref: utils/vocabulary.py).

31 symbols: blank '' (id 0), space, <s>, </s>, a-z, apostrophe — blank id 0 is
the transducer blank everywhere (vocabulary.py:4, decoding.py:28).
"""

from __future__ import annotations

from typing import List

BLANK = ""
SPACE = " "


def init_vocab() -> List[str]:
    alphabet = "abcdefghijklmnopqrstuvwxyz'"
    return [BLANK, SPACE, "<s>", "</s>"] + list(alphabet)


def save_vocab(vocab: List[str], filepath: str) -> None:
    """Blank/space written as sentinels (ref: vocabulary.py:25-33)."""
    with open(filepath, "w") as f:
        for c in vocab:
            if c == BLANK:
                c = "<blank>"
            elif c == SPACE:
                c = "<space>"
            f.write(f"{c}\n")


def load_vocab(filepath: str) -> List[str]:
    vocab = []
    with open(filepath) as f:
        for line in f:
            line = line.rstrip("\n").strip()
            if line == "<blank>":
                line = BLANK
            elif line == "<space>":
                line = SPACE
            vocab.append(line)
    return vocab
