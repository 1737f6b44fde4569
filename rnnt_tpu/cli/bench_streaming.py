"""Streaming decode latency benchmark (BASELINE.md p50 chunk latency).

Feeds fixed-size audio chunks (default 1024 samples @16 kHz = 64 ms, the
reference's mic geometry, streaming_transcribe.py:16-17) through the
stateful StreamingTranscriber on a randomly initialized flagship model and
reports per-chunk latency percentiles.

  python -m rnnt_tpu.cli.bench_streaming [--chunks 200] [--tiny]

With --checkpoint + --audio_dir it instead measures the QUALITY cost of
streaming: every utterance of --split is decoded offline and chunk-streamed
and the WER delta is reported (BASELINE.md streamed-vs-offline metric).

  python -m rnnt_tpu.cli.bench_streaming --checkpoint runs/x \
      --audio_dir corpus/ --split test-synth
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunks", type=int, default=100)
    p.add_argument("--chunk_samples", type=int, default=1024)
    p.add_argument("--tiny", action="store_true",
                   help="debug-size model instead of the parity config")
    p.add_argument("--checkpoint", default=None,
                   help="decode a real model: streamed-vs-offline WER mode")
    p.add_argument("--audio_dir", default=None,
                   help="LibriSpeech-layout corpus root (WER mode)")
    p.add_argument("--split", default="test-synth")
    p.add_argument("--max_utts", type=int, default=0, help="0 = all")
    args = p.parse_args(argv)
    if args.checkpoint and not args.audio_dir:
        p.error("--checkpoint (WER mode) requires --audio_dir")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rnnt_tpu.cli import benchutil
    from rnnt_tpu.config import RNNTConfig, tiny_config
    from rnnt_tpu.data.tokenizer import CharTokenizer
    from rnnt_tpu.decode.streaming import StreamingTranscriber
    from rnnt_tpu.models.transducer import init_transducer_params

    if args.checkpoint:
        import itertools

        from rnnt_tpu.compile_cache import enable_compile_cache
        from rnnt_tpu.data import librispeech
        from rnnt_tpu.data.tokenizer import (SUBWORD_FILENAME,
                                              get_tokenizer)
        from rnnt_tpu.decode.streaming import streamed_vs_offline
        from rnnt_tpu.train import checkpoint as ckpt_mod

        enable_compile_cache()
        cfg = ckpt_mod.load_config(args.checkpoint)
        tok = get_tokenizer(
            ckpt_mod.sidecar_dir(args.checkpoint, SUBWORD_FILENAME),
            cfg.token_type, cfg.vocab_size)
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg, dtype)
        utts = librispeech.load_dataset(args.audio_dir, [args.split])
        if args.max_utts:
            utts = itertools.islice(utts, args.max_utts)
        off_wer, str_wer, details = streamed_vs_offline(
            cfg, state.params, tok, utts, chunk_samples=args.chunk_samples)
        print(json.dumps({
            "metric": "streamed_vs_offline_wer_delta",
            "value": round(str_wer - off_wer, 4),
            "unit": "WER",
            "offline_wer": round(off_wer, 4),
            "streamed_wer": round(str_wer, 4),
            "n_utts": len(details),
            "chunk_samples": args.chunk_samples,
            "backend": jax.default_backend(),
            "rtt_ms": round(benchutil.measure_rtt_ms(), 1),
        }))
        return

    if args.tiny:
        cfg = tiny_config()
    else:
        cfg = RNNTConfig(token_type="character", vocab_size=31)
    tok = CharTokenizer()
    cfg = cfg.replace(vocab_size=tok.vocab_size)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = init_transducer_params(jax.random.PRNGKey(0), cfg, dtype)
    # prime_seconds=0: the latency benchmark times steady-state per-chunk
    # compute; the quality-priming buffer would turn early timed chunks into
    # near-zero appends and shift the JIT compiles past the warmup cutoff
    st = StreamingTranscriber(cfg, params, tok, prime_seconds=0)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(args.chunks * args.chunk_samples)
             .astype(np.float32) * 0.1)

    lat = []
    for i in range(args.chunks):
        chunk = audio[i * args.chunk_samples:(i + 1) * args.chunk_samples]
        t0 = time.perf_counter()
        st.process_chunk(chunk)
        lat.append(time.perf_counter() - t0)

    lat_ms = np.asarray(lat[3:]) * 1e3  # skip compile warmup chunks
    chunk_ms = args.chunk_samples / cfg.sample_rate * 1e3
    print(json.dumps({
        "metric": "streaming_chunk_latency_p50",
        "value": round(float(np.percentile(lat_ms, 50)), 2),
        "unit": "ms",
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "chunk_ms": chunk_ms,
        "real_time_factor": round(float(np.percentile(lat_ms, 50)) / chunk_ms, 3),
        "backend": jax.default_backend(),
        # transport share of the per-chunk latency (benchutil docstring)
        "rtt_ms": round(benchutil.measure_rtt_ms(), 1),
    }))


if __name__ == "__main__":
    main()
