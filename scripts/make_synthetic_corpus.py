"""Deterministic synthetic speech corpus in LibriSpeech layout.

Zero-egress stand-in for a real corpus: each "word" is a fixed-frequency
tone burst, so transcripts are exactly recoverable from audio and an RNN-T
can learn the mapping.  Used for the end-to-end on-chip validation recorded
in BASELINE.md (the reference assumes Common Voice / LibriSpeech on disk and
ships no equivalent; its debug corpus tooling is debug/get_common_voice_stats.py).

Layout written:  <out>/<split>/<speaker>/<chapter>/<utt>.wav + .trans.txt

Usage:
    python scripts/make_synthetic_corpus.py --output_dir /tmp/synth \
        [--train 300 --dev 24 --test 24] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnnt_tpu.data.audio_io import write_wav  # noqa: E402

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliett"]
SR = 16000


def tone_word(word: str, rng) -> np.ndarray:
    """0.25 s tone at a word-specific frequency + mild noise, 20 ms fades."""
    f = 200.0 + 80.0 * WORDS.index(word)
    n = int(0.25 * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * f * t)
    fade = int(0.02 * SR)
    env = np.ones(n)
    env[:fade] = np.linspace(0, 1, fade)
    env[-fade:] = np.linspace(1, 0, fade)
    return (x * env + rng.standard_normal(n) * 0.005).astype(np.float32)


def utterance(words, rng) -> np.ndarray:
    gap = np.zeros(int(0.05 * SR), np.float32)
    parts = [gap]
    for w in words:
        parts += [tone_word(w, rng), gap]
    return np.concatenate(parts)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train", type=int, default=300)
    p.add_argument("--dev", type=int, default=24)
    p.add_argument("--test", type=int, default=24)
    p.add_argument("--min_words", type=int, default=2)
    p.add_argument("--max_words", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    for split, n in [("train-synth", args.train), ("dev-synth", args.dev),
                     ("test-synth", args.test)]:
        d = os.path.join(args.output_dir, split, "1", "1")
        os.makedirs(d, exist_ok=True)
        lines = []
        total_s = 0.0
        for i in range(n):
            utt = f"1-1-{i:04d}"
            k = int(rng.integers(args.min_words, args.max_words + 1))
            words = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), k)]
            audio = utterance(words, rng)
            total_s += len(audio) / SR
            write_wav(os.path.join(d, f"{utt}.wav"), audio, SR)
            lines.append(f"{utt} {' '.join(words).upper()}")
        with open(os.path.join(d, "1-1.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {n} utts, {total_s:.1f} audio-s")


if __name__ == "__main__":
    main()
