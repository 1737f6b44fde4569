"""Preprocess Common Voice into record shards (ref: preprocess_common_voice.py).

  python -m rnnt_tpu.cli.preprocess_common_voice \
      --data_dir cv/en --output_dir data/cv
"""

from __future__ import annotations

import argparse
import os

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.data import common_voice, pipeline, records
from rnnt_tpu.data.tokenizer import get_tokenizer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--splits", nargs="+", default=["train", "dev", "test"])
    p.add_argument("--token_type", default="word-piece",
                   choices=["word-piece", "character"])
    p.add_argument("--vocab_size", type=int, default=4096)
    p.add_argument("--pad_vocab", action="store_true",
                   help="pad the subword vocab with reserved unused ids up "
                        "to --vocab_size (full-width joint softmax even on "
                        "corpora whose BPE saturates early)")
    p.add_argument("--bpe_pieces", type=int, default=0,
                   help="cap the LEARNED BPE vocab at this many pieces "
                        "(0 = --vocab_size); see preprocess_librispeech")
    p.add_argument("--max_length", type=float, default=17.0)
    p.add_argument("--num_shards", type=int, default=8)
    p.add_argument("--workers", type=int, default=1,
                   help="featurization worker processes (1 = in-process)")
    args = p.parse_args()

    if not os.path.isdir(args.data_dir):
        raise SystemExit(f"--data_dir {args.data_dir}: no such directory")

    cfg = RNNTConfig(token_type=args.token_type, vocab_size=args.vocab_size)
    os.makedirs(args.output_dir, exist_ok=True)

    tok = get_tokenizer(
        args.output_dir, args.token_type, args.vocab_size,
        pad_to_target=args.pad_vocab, learn_vocab_size=args.bpe_pieces,
        corpus=common_voice.texts_generator(args.data_dir))  # train split only
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    cfg.save(args.output_dir)

    for split in args.splits:
        if args.workers > 1:
            stream = pipeline.preprocess_corpus_parallel(
                common_voice.iter_utterance_files(args.data_dir, split),
                args.output_dir, cfg, workers=args.workers,
                max_length_seconds=args.max_length)
        else:
            stream = pipeline.preprocess_corpus(
                common_voice.load_dataset(args.data_dir, split), tok, cfg,
                max_length_seconds=args.max_length)
        pattern = os.path.join(
            args.output_dir, split + "-{shard:05d}-of-{total:05d}.rnr")
        paths = records.write_shards(stream, pattern, args.num_shards)
        n = records.write_shards.last_count
        print(f"{split}: wrote {n} examples into {len(paths)} shards")
        if n == 0:
            raise SystemExit(
                f"{split}: no examples produced — check --data_dir "
                f"({args.data_dir})")


if __name__ == "__main__":
    main()
