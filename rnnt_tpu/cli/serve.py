"""Transcription server: HTTP batch endpoint + TCP streaming sessions.

The serving surface the reference never had (its inference is local CLIs
only — transcribe_file.py / streaming_transcribe.py's pyaudio loop):

  python -m rnnt_tpu.cli.serve --checkpoint runs/ls100 \
      [--host 0.0.0.0] [--http_port 8080] [--stream_port 8081]

  curl -s -X POST --data-binary @audio.wav localhost:8080/transcribe
  curl -s -X POST --data-binary @a.wav 'localhost:8080/transcribe?beam=4'
  curl -s localhost:8080/info

Streaming protocol (TCP :8081): send `u32 n | n bytes float32 PCM` frames,
empty frame ends the stream; every frame is answered with
`u32 m | JSON {"text", "final"}`.  See rnnt_tpu/serve.py.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--http_port", type=int, default=8080)
    p.add_argument("--stream_port", type=int, default=8081)
    p.add_argument("--quantized", default=None, metavar="MODEL_INT8_NPZ",
                   help="serve from an int8 cli.quantize_model artifact")
    p.add_argument("--int8_exec", action="store_true",
                   help="with --quantized: EXECUTE pred-net+joint in int8 "
                        "(1.43x faster greedy decode, half the weight HBM "
                        "— BASELINE.md); beam requests route through the "
                        "XLA beam (qdot int8 hooks)")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   help="skip pre-compiling the common decode buckets at "
                        "startup (first requests then pay the jit compile "
                        "under the device lock)")
    p.add_argument("--warmup_beam", type=int, default=4,
                   help="beam width to pre-compile alongside greedy "
                        "(0 = greedy buckets only)")
    p.add_argument("--max_frames", type=int, default=512,
                   help="largest frame bucket /transcribe accepts; longer "
                        "utterances get 413 (one oversized request would "
                        "otherwise compile+decode a huge program under the "
                        "device lock, stalling all traffic)")
    args = p.parse_args(argv)

    from rnnt_tpu.compile_cache import enable_compile_cache
    from rnnt_tpu.serve import Server

    enable_compile_cache()
    srv = Server(args.checkpoint, host=args.host, http_port=args.http_port,
                 stream_port=args.stream_port, quantized=args.quantized,
                 int8_exec=args.int8_exec, warmup=args.warmup,
                 warmup_beams=((0, args.warmup_beam) if args.warmup_beam
                               else (0,)),
                 max_t_pad=args.max_frames)
    if srv.warmup_seconds:
        print(f"warmup: pre-compiled decode buckets in "
              f"{srv.warmup_seconds:.1f}s")
    print(f"serving {args.checkpoint}: "
          f"http://{args.host}:{srv.http_port} (POST /transcribe, /info), "
          f"streaming tcp://{args.host}:{srv.stream_port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
