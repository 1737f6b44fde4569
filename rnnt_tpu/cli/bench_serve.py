"""Serving-layer benchmark: HTTP transcribe latency/throughput + streaming.

The serving stack (rnnt_tpu/serve.py) is beyond-reference surface (SURVEY.md
§1: the reference has no server), so it carries its own measured numbers in
BASELINE.md: cold-start-to-first-transcription (with and without the warmup
pre-compile), request latency percentiles, sustained req/s, and concurrent-
client behavior under the device lock.

Usage (against a trained checkpoint, on the serving chip):
    python -m rnnt_tpu.cli.bench_serve --checkpoint runs/ls100 \
        [--requests 50] [--concurrency 4] [--seconds 3.0]

Drives the real HTTP/TCP servers over loopback sockets — network framing,
JSON, and lock contention are all in the measured path.
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import socket
import struct
import threading
import time
import wave

import numpy as np


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _http_transcribe(port: int, body: bytes, timeout=600, beam=0) -> float:
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    path = f"/transcribe?beam={beam}" if beam else "/transcribe"
    conn.request("POST", path, body=body)
    r = conn.getresponse()
    assert r.status == 200, r.read()
    json.loads(r.read())
    conn.close()
    return time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--requests", type=int, default=50)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--seconds", type=float, default=3.0,
                   help="duration of the synthetic benchmark utterance")
    p.add_argument("--chunk", type=int, default=1024,
                   help="streaming chunk size in samples")
    p.add_argument("--no-warmup", dest="warmup", action="store_false")
    p.add_argument("--quantized", default=None, metavar="MODEL_INT8_NPZ")
    p.add_argument("--int8_exec", action="store_true",
                   help="with --quantized: serve the true-int8 execution "
                        "path (BASELINE int8 serving latency)")
    args = p.parse_args(argv)

    from rnnt_tpu.compile_cache import enable_compile_cache
    from rnnt_tpu.serve import Server

    enable_compile_cache()

    # Tunnel RTT, measured FIRST and printed with every run so cross-round
    # serving comparisons can separate transport from stack (benchutil).
    from rnnt_tpu.cli.benchutil import measure_rtt_ms

    rtt_ms = measure_rtt_ms()
    print(f"rtt_ms: {rtt_ms:.1f} (p50 of 20 scalar device round-trips; "
          f"subtract from every latency below for on-chip stack time)")

    sr = 16000
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(args.seconds * sr)) * 0.1).astype(
        np.float32)
    body = _wav_bytes(audio, sr)

    # cold start: construction (+ optional warmup) + first request
    t0 = time.perf_counter()
    srv = Server(args.checkpoint, http_port=0, stream_port=0,
                 quantized=args.quantized, int8_exec=args.int8_exec,
                 warmup=args.warmup)
    srv.serve_background()
    t_up = time.perf_counter() - t0
    t_first = _http_transcribe(srv.http_port, body)
    print(f"cold start: server up {t_up:.2f}s "
          f"(warmup {srv.warmup_seconds:.2f}s), "
          f"first request {t_first:.2f}s, "
          f"total-to-first-transcription {t_up + t_first:.2f}s")
    # with warmup, the FIRST beam request must pay no compile either
    # (warmup pre-compiles beams=(0, 4) buckets — VERDICT r3 weak #6)
    t_first_beam = _http_transcribe(srv.http_port, body, beam=4)
    print(f"first beam-4 request: {t_first_beam:.2f}s")

    # sequential latency
    lats = [_http_transcribe(srv.http_port, body)
            for _ in range(args.requests)]
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    p50 = float(np.percentile(lats_ms, 50))
    p99 = float(np.percentile(lats_ms, 99))
    print(f"sequential: {args.requests} reqs of {args.seconds:.1f}s audio  "
          f"p50 {p50:.1f} ms  p99 {p99:.1f} ms  "
          f"{1e3 / p50 * args.seconds:.1f}x realtime at p50")

    # concurrent throughput: N workers hammering /transcribe
    per_worker = max(4, args.requests // args.concurrency)
    all_lats, errors = [], []

    def worker():
        try:
            for _ in range(per_worker):
                all_lats.append(_http_transcribe(srv.http_port, body))
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    assert not errors, errors
    n = args.concurrency * per_worker
    c_ms = np.sort(np.asarray(all_lats)) * 1e3
    print(f"concurrent x{args.concurrency}: {n} reqs in {wall:.2f}s = "
          f"{n / wall:.1f} req/s ({n * args.seconds / wall:.1f} audio-s/s)  "
          f"p50 {float(np.percentile(c_ms, 50)):.1f} ms  "
          f"p99 {float(np.percentile(c_ms, 99)):.1f} ms")

    # streaming session: per-chunk roundtrip latency through the TCP framing
    s = socket.create_connection(("127.0.0.1", srv.stream_port), timeout=600)

    def stream_roundtrip(payload: bytes):
        t0 = time.perf_counter()
        s.sendall(struct.pack("<I", len(payload)) + payload)
        hdr = b""
        while len(hdr) < 4:
            hdr += s.recv(4 - len(hdr))
        (m,) = struct.unpack("<I", hdr)
        buf = b""
        while len(buf) < m:
            buf += s.recv(m - len(buf))
        json.loads(buf)
        return time.perf_counter() - t0

    chunk_bytes = args.chunk * 4
    chunk_lats = []
    for off in range(0, len(audio) - args.chunk, args.chunk):
        payload = np.asarray(audio[off: off + args.chunk], "<f4").tobytes()
        assert len(payload) == chunk_bytes
        chunk_lats.append(stream_roundtrip(payload))
    s.sendall(struct.pack("<I", 0))
    s.close()
    cl_ms = np.sort(np.asarray(chunk_lats[2:])) * 1e3  # skip compile chunks
    chunk_s = args.chunk / sr
    print(f"streaming: {len(chunk_lats)} chunks of {chunk_s * 1e3:.0f} ms  "
          f"p50 {float(np.percentile(cl_ms, 50)):.1f} ms  "
          f"p99 {float(np.percentile(cl_ms, 99)):.1f} ms per chunk")

    srv.shutdown()
    # Skip interpreter/XLA teardown: the CPU backend's thread pools can
    # abort on destruction under live server daemon threads; everything is
    # printed and flushed by now.
    import os
    import sys as _sys

    _sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
