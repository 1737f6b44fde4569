"""Common Voice adapter + preprocess CLI (ref: utils/data/common_voice.py,
preprocess_common_voice.py, scripts/remove_missing_samples.py).

Builds a synthetic TSV corpus on disk and drives: row parsing with .mp3->.wav
rewrite, missing-sample detection/removal, tokenizer-corpus generation, and
the full preprocess CLI down to readable record shards.
"""

import os
import sys

import numpy as np
import pytest

from rnnt_tpu.data import common_voice, records
from rnnt_tpu.data.audio_io import write_wav


WORDS = ["alpha", "bravo", "charlie", "delta"]


@pytest.fixture()
def cv_corpus(tmp_path):
    base = tmp_path / "cv"
    clips = base / "clips"
    clips.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = {"train": 6, "dev": 2, "test": 2}
    for split, n in rows.items():
        lines = ["client_id\tpath\tsentence\tup_votes"]
        for i in range(n):
            name = f"{split}_{i:03d}"
            text = " ".join(rng.choice(WORDS, 3))
            # TSV references the original .mp3; adapter must rewrite to .wav
            # (common_voice.py:7-19 in the reference).
            lines.append(f"c{i}\t{name}.mp3\t{text}\t2")
            if not (split == "train" and i == 5):  # one missing wav in train
                sig = 0.1 * rng.standard_normal(int(0.4 * 16000))
                write_wav(str(clips / f"{name}.wav"),
                          sig.astype(np.float32), 16000)
        (base / f"{split}.tsv").write_text("\n".join(lines) + "\n")
    return base


def test_rows_rewrite_mp3_to_wav(cv_corpus):
    rows = list(common_voice._rows(str(cv_corpus), "dev"))
    assert len(rows) == 2
    for path, text in rows:
        assert path.endswith(".wav") and os.sep + "clips" + os.sep in path
        assert all(w in WORDS for w in text.split())


def test_load_dataset_skips_missing(cv_corpus):
    items = list(common_voice.load_dataset(str(cv_corpus), "train"))
    assert len(items) == 5  # 6 rows, 1 missing wav
    audio, sr, text = items[0]
    assert sr == 16000 and audio.ndim == 1 and audio.size > 0
    assert isinstance(text, str) and text


def test_texts_generator_train_only(cv_corpus):
    texts = list(common_voice.texts_generator(str(cv_corpus)))
    assert len(texts) == 6  # all TSV rows, even missing-audio ones


def test_missing_samples_and_remove(cv_corpus):
    missing = common_voice.missing_samples(str(cv_corpus), "train")
    assert len(missing) == 1 and missing[0].endswith("train_005.wav")
    assert common_voice.remove_missing(str(cv_corpus), "train") == 1
    assert common_voice.missing_samples(str(cv_corpus), "train") == []
    assert len(list(common_voice._rows(str(cv_corpus), "train"))) == 5
    # idempotent
    assert common_voice.remove_missing(str(cv_corpus), "train") == 0


def test_preprocess_cli_end_to_end(cv_corpus, tmp_path, monkeypatch):
    from rnnt_tpu.cli import preprocess_common_voice as cli

    out = tmp_path / "data"
    monkeypatch.setattr(sys, "argv", [
        "preprocess_common_voice",
        "--data_dir", str(cv_corpus), "--output_dir", str(out),
        "--token_type", "character", "--num_shards", "2",
        "--max_length", "5.0"])
    cli.main()

    shards = sorted(p for p in os.listdir(out) if p.startswith("train-"))
    assert len(shards) == 2
    examples = []
    for s in shards:
        examples.extend(records.read_shard(str(out / s)))
    assert len(examples) == 5
    ex = examples[0]
    assert ex["mel_specs"].ndim == 2 and ex["labels"].size > 0
    assert int(ex["pred_inp"][0]) == 0  # prepended start/blank id
