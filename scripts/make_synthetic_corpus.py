"""Deterministic synthetic speech corpus in LibriSpeech layout.

Zero-egress stand-in for a real corpus: transcripts are exactly recoverable
from audio, so an RNN-T can learn the mapping.  Used for the end-to-end
on-chip validation recorded in BASELINE.md (the reference assumes Common
Voice / LibriSpeech on disk and ships no equivalent; its corpus tooling is
debug/get_common_voice_stats.py).

Two styles:
- "tones" (default, round-1 compatible): each of 10 NATO words is one
  fixed-frequency tone burst.
- "letters": words are pronounceable CVCV strings from a generated vocabulary
  (--vocab N); each LETTER is a fixed-frequency tone segment (a phoneme
  stand-in), so the audio->text mapping is compositional and the corpus
  scales to hundreds of distinct words — the parity-campaign corpus.

--noise adds waveform noise; --gain_jitter and --freq_jitter add per-utterance
acoustic variability so the model must generalize, not memorize waveforms.

Layout written:  <out>/<split>/<speaker>/<chapter>/<utt>.wav + .trans.txt

Usage:
    python scripts/make_synthetic_corpus.py --output_dir /tmp/synth \
        [--train 300 --dev 24 --test 24] [--style letters --vocab 200] \
        [--noise 0.02] [--seed 0]
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

CONSONANTS = "bdfgkmnprst"
VOWELS = "aeiou"
LETTER_SECONDS = 0.1
LETTER_FADE = 0.015


def letter_freq(ch: str) -> float:
    """One fixed frequency per letter, 300-5000 Hz (mel band is 125-7600)."""
    alphabet = sorted(set(CONSONANTS + VOWELS))
    i = alphabet.index(ch)
    return 300.0 * (1.19 ** i)  # geometric spacing, ~mel-uniform


def make_vocab(n: int, rng) -> list:
    """n pronounceable CVCV(CV) words, deterministic for a given seed."""
    words = set()
    while len(words) < n:
        k = int(rng.integers(2, 4))  # 2 or 3 CV syllables
        w = "".join(rng.choice(list(CONSONANTS)) + rng.choice(list(VOWELS))
                    for _ in range(k))
        words.add(w)
    return sorted(words)


def letter_word(word: str, rng, noise: float, freq_jitter: float) -> np.ndarray:
    """Concatenated per-letter tone segments."""
    n = int(LETTER_SECONDS * SR)
    fade = int(LETTER_FADE * SR)
    env = np.ones(n)
    env[:fade] = np.linspace(0, 1, fade)
    env[-fade:] = np.linspace(1, 0, fade)
    parts = []
    t = np.arange(n) / SR
    for ch in word:
        f = letter_freq(ch) * (1.0 + freq_jitter * rng.standard_normal())
        parts.append(0.3 * np.sin(2 * np.pi * f * t) * env)
    return np.concatenate(parts).astype(np.float32)


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


def utterance(words, rng, style: str, noise: float, gain_jitter: float,
              freq_jitter: float) -> np.ndarray:
    gap = np.zeros(int(0.05 * SR), np.float32)
    parts = [gap]
    for w in words:
        seg = (tone_word(w, rng) if style == "tones"
               else letter_word(w, rng, noise, freq_jitter))
        parts += [seg, gap]
    x = np.concatenate(parts)
    gain = 1.0 + gain_jitter * rng.standard_normal()
    x = x * np.float32(max(0.2, gain))
    if noise > 0:
        x = x + rng.standard_normal(len(x)).astype(np.float32) * noise
    return x.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train", type=int, default=300)
    p.add_argument("--dev", type=int, default=24)
    p.add_argument("--test", type=int, default=24)
    p.add_argument("--min_words", type=int, default=2)
    p.add_argument("--max_words", type=int, default=6)
    p.add_argument("--style", default="tones", choices=["tones", "letters"])
    p.add_argument("--vocab", type=int, default=200,
                   help="word-vocabulary size (letters style only)")
    p.add_argument("--noise", type=float, default=0.0,
                   help="additive waveform noise stddev")
    p.add_argument("--gain_jitter", type=float, default=0.0)
    p.add_argument("--freq_jitter", type=float, default=0.0,
                   help="relative per-letter frequency jitter (letters style)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    vocab = WORDS if args.style == "tones" else make_vocab(args.vocab, rng)
    for split, n in [("train-synth", args.train), ("dev-synth", args.dev),
                     ("test-synth", args.test)]:
        d = os.path.join(args.output_dir, split, "1", "1")
        os.makedirs(d, exist_ok=True)
        lines = []
        total_s = 0.0
        for i in range(n):
            utt = f"1-1-{i:04d}"
            k = int(rng.integers(args.min_words, args.max_words + 1))
            words = [vocab[int(j)] for j in rng.integers(0, len(vocab), k)]
            audio = utterance(words, rng, args.style, args.noise,
                              args.gain_jitter, args.freq_jitter)
            total_s += len(audio) / SR
            write_wav(os.path.join(d, f"{utt}.wav"), audio, SR)
            lines.append(f"{utt} {' '.join(words).upper()}")
        with open(os.path.join(d, "1-1.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"{split}: {n} utts, {total_s:.1f} audio-s, "
              f"{len(vocab)}-word vocab")


if __name__ == "__main__":
    main()
