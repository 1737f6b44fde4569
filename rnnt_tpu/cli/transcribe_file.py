"""Transcribe audio file(s) from a trained checkpoint.

Replaces the reference's transcribe_file.py (single WAV, greedy only,
:14-41) with a batched version: many files decode in ONE padded batch (the
whole batch rides one jit invocation — at B=64 the chip decodes ~15k
audio-s/s, cli/bench_decode), with optional beam search.

  python -m rnnt_tpu.cli.transcribe_file --checkpoint runs/ls100 \
      -i a.wav b.flac c.wav [--beam 4]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir with config.json + tokenizer")
    p.add_argument("-i", "--input", required=True, nargs="+",
                   help="audio file(s) (wav/flac); multiple files decode "
                        "as one padded batch")
    p.add_argument("--beam", type=int, default=0,
                   help="beam width; 0 = greedy")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from rnnt_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from rnnt_tpu.data.audio_io import read_audio
    from rnnt_tpu.data.tokenizer import SUBWORD_FILENAME, get_tokenizer
    from rnnt_tpu.models.transducer import Transducer
    from rnnt_tpu.ops.features import preprocess_audio
    from rnnt_tpu.train import checkpoint as ckpt_mod

    # hparams + tokenizer + weights all from the checkpoint dir
    # (transcribe_file.py:16-26)
    cfg = ckpt_mod.load_config(args.checkpoint)
    tokenizer = get_tokenizer(ckpt_mod.sidecar_dir(
        args.checkpoint, SUBWORD_FILENAME), cfg.token_type, cfg.vocab_size)
    state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg)
    model = Transducer(cfg)

    mels, lengths = [], []
    for path in args.input:
        audio, sr = read_audio(path)
        assert sr == cfg.sample_rate, \
            f"{path}: expected {cfg.sample_rate} Hz audio, got {sr}"
        m = np.asarray(preprocess_audio(jnp.asarray(audio), cfg))
        mels.append(m)
        lengths.append(m.shape[0])

    # Pad T to the next power-of-two bucket (true lengths passed alongside):
    # XLA compiles once per shape, so a closed shape set makes repeated CLI
    # invocations (and mixed-length batches) hit the compile cache instead
    # of paying a fresh trace+compile per utterance length.
    T = max(lengths)
    Tp = max(16, 1 << (T - 1).bit_length())
    B = len(mels)
    mel = np.zeros((B, Tp, cfg.input_feat_size), np.float32)
    for i, m in enumerate(mels):
        mel[i, : m.shape[0]] = m
    mel = jnp.asarray(mel)
    spec_lengths = jnp.asarray(lengths, jnp.int32)

    if args.beam > 0:
        from rnnt_tpu.decode.beam import beam_search_decode

        tokens, out_lens, _ = beam_search_decode(
            model, state.params, mel, spec_lengths, beam_width=args.beam)
    else:
        from rnnt_tpu.decode.greedy import greedy_decode

        tokens, out_lens = greedy_decode(model, state.params, mel, spec_lengths)

    tokens = np.asarray(tokens)
    out_lens = np.asarray(out_lens)
    for i, path in enumerate(args.input):
        text = tokenizer.decode(tokens[i, : int(out_lens[i])].tolist())
        # single file keeps the reference's bare-text output contract
        print(text if B == 1 else f"{path}\t{text}")


if __name__ == "__main__":
    main()
