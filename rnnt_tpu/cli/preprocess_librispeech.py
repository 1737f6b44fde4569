"""Preprocess LibriSpeech into record shards (ref: preprocess_librispeech.py).

Builds/loads the subword tokenizer from the train split, featurizes each split
(STFT->log-mel->stack), tokenizes transcripts, writes .rnr shards.

  python -m rnnt_tpu.cli.preprocess_librispeech \
      --data_dir LibriSpeech --output_dir data/ls \
      --train_splits train-clean-100 --dev_splits dev-clean \
      --test_splits test-clean
"""

from __future__ import annotations

import argparse
import os

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.data import librispeech, pipeline, records
from rnnt_tpu.data.tokenizer import get_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    # ref ships with all three set to dev-clean (preprocess_librispeech.py:53-63);
    # we default to the real lists it left commented out (:65-79).
    p.add_argument("--train_splits", nargs="+", default=["train-clean-100"])
    p.add_argument("--dev_splits", nargs="+", default=["dev-clean"])
    p.add_argument("--test_splits", nargs="+", default=["test-clean"])
    p.add_argument("--token_type", default="word-piece",
                   choices=["word-piece", "character"])
    p.add_argument("--vocab_size", type=int, default=4096)
    p.add_argument("--pad_vocab", action="store_true",
                   help="pad the subword vocab with reserved unused ids up "
                        "to --vocab_size (full-width joint softmax even on "
                        "corpora whose BPE saturates early)")
    p.add_argument("--bpe_pieces", type=int, default=0,
                   help="cap the LEARNED BPE vocab at this many pieces "
                        "(0 = --vocab_size); with --pad_vocab the rest is "
                        "reserved padding, decoupling target granularity "
                        "(letters/syllables vs whole words) from the joint "
                        "softmax width. Floor: the single-character alphabet "
                        "(+blank) is always kept for encodability, so the "
                        "effective vocab never drops below 1 + alphabet even "
                        "for smaller values")
    p.add_argument("--max_length", type=float, default=17.0,
                   help="drop utterances longer than this many seconds "
                        "(preprocessing.py:264-266)")
    p.add_argument("--num_shards", type=int, default=8)
    p.add_argument("--workers", type=int, default=1,
                   help="featurization worker processes (decode+STFT+mel+"
                        "tokenize scale with host cores; 1 = in-process)")
    args = p.parse_args()

    if not os.path.isdir(args.data_dir):
        raise SystemExit(f"--data_dir {args.data_dir}: no such directory")

    cfg = RNNTConfig(token_type=args.token_type, vocab_size=args.vocab_size)
    os.makedirs(args.output_dir, exist_ok=True)

    tok = get_tokenizer(
        args.output_dir, args.token_type, args.vocab_size,
        pad_to_target=args.pad_vocab, learn_vocab_size=args.bpe_pieces,
        corpus=librispeech.texts_generator(args.data_dir, args.train_splits))
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    cfg.save(args.output_dir)

    for name, splits in [("train", args.train_splits),
                         ("dev", args.dev_splits),
                         ("test", args.test_splits)]:
        if args.workers > 1:
            stream = pipeline.preprocess_corpus_parallel(
                librispeech.iter_utterance_files(args.data_dir, splits),
                args.output_dir, cfg, workers=args.workers,
                max_length_seconds=args.max_length)
        else:
            stream = pipeline.preprocess_corpus(
                librispeech.load_dataset(args.data_dir, splits), tok, cfg,
                max_length_seconds=args.max_length)
        pattern = os.path.join(
            args.output_dir, name + "-{shard:05d}-of-{total:05d}.rnr")
        paths = records.write_shards(stream, pattern, args.num_shards)
        n = records.write_shards.last_count
        print(f"{name}: wrote {n} examples into {len(paths)} shards")
        if n == 0:
            raise SystemExit(
                f"{name}: no examples produced — check --data_dir/splits "
                f"({args.data_dir} {splits})")


if __name__ == "__main__":
    main()
