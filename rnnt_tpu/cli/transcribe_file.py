"""Transcribe one audio file (ref: transcribe_file.py).

  python -m rnnt_tpu.cli.transcribe_file --checkpoint runs/ls100 -i audio.wav
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir with config.json + tokenizer")
    p.add_argument("-i", "--input", required=True, help="audio file (wav/flac)")
    p.add_argument("--beam", type=int, default=0,
                   help="beam width; 0 = greedy")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from rnnt_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from rnnt_tpu.data.audio_io import read_audio
    from rnnt_tpu.data.tokenizer import get_tokenizer
    from rnnt_tpu.models.transducer import Transducer
    from rnnt_tpu.ops.features import preprocess_audio
    from rnnt_tpu.train import checkpoint as ckpt_mod

    # hparams + tokenizer + weights all from the checkpoint dir
    # (transcribe_file.py:16-26)
    cfg = ckpt_mod.load_config(args.checkpoint)
    tokenizer = get_tokenizer(args.checkpoint, cfg.token_type, cfg.vocab_size)
    state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg)
    model = Transducer(cfg)

    audio, sr = read_audio(args.input)
    assert sr == cfg.sample_rate, f"expected {cfg.sample_rate} Hz audio, got {sr}"
    mel = preprocess_audio(jnp.asarray(audio), cfg)[None]  # [1, T, F]

    # Pad T to the next power-of-two bucket (true length passed alongside):
    # XLA compiles once per shape, so a closed shape set makes repeated CLI
    # invocations (and multi-file loops) hit the compile cache instead of
    # paying a fresh trace+compile per utterance length.
    T = mel.shape[1]
    Tp = max(16, 1 << (T - 1).bit_length())
    mel = jnp.pad(mel, ((0, 0), (0, Tp - T), (0, 0)))
    spec_lengths = jnp.full((1,), T, jnp.int32)

    if args.beam > 0:
        from rnnt_tpu.decode.beam import beam_search_decode

        tokens, lengths, _ = beam_search_decode(
            model, state.params, mel, spec_lengths, beam_width=args.beam)
    else:
        from rnnt_tpu.decode.greedy import greedy_decode

        tokens, lengths = greedy_decode(model, state.params, mel, spec_lengths)
    ids = np.asarray(tokens)[0, : int(np.asarray(lengths)[0])].tolist()
    print(tokenizer.decode(ids))


if __name__ == "__main__":
    main()
