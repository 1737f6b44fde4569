"""Streaming transcription CLI (ref: streaming_transcribe.py).

Live microphone mode (pyaudio, like the reference :63-69) when available,
plus a --simulate_file mode that drives the same chunked path from a WAV/FLAC
file — reproducible and testable without audio hardware.

  python -m rnnt_tpu.cli.streaming_transcribe --checkpoint runs/ls100 \
      --simulate_file audio.wav
"""

from __future__ import annotations

import argparse
import sys
import time


CHUNK_SAMPLES = 1024          # ref: streaming_transcribe.py:17
SAMPLE_RATE = 16000           # ref: streaming_transcribe.py:16


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--simulate_file", default=None,
                   help="stream this audio file instead of the microphone")
    p.add_argument("--chunk_samples", type=int, default=CHUNK_SAMPLES)
    p.add_argument("--realtime", action="store_true",
                   help="pace simulated chunks at real time")
    args = p.parse_args(argv)

    from rnnt_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from rnnt_tpu.data.tokenizer import SUBWORD_FILENAME, get_tokenizer
    from rnnt_tpu.decode.streaming import StreamingTranscriber
    from rnnt_tpu.train import checkpoint as ckpt_mod

    cfg = ckpt_mod.load_config(args.checkpoint)
    tokenizer = get_tokenizer(ckpt_mod.sidecar_dir(
        args.checkpoint, SUBWORD_FILENAME), cfg.token_type, cfg.vocab_size)
    state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg)
    transcriber = StreamingTranscriber(cfg, state.params, tokenizer)

    if args.simulate_file:
        from rnnt_tpu.data.audio_io import read_audio

        audio, sr = read_audio(args.simulate_file)
        assert sr == cfg.sample_rate
        last = ""
        t0 = time.time()
        for off in range(0, len(audio), args.chunk_samples):
            chunk = audio[off: off + args.chunk_samples]
            if args.realtime:
                target = off / sr
                dt = target - (time.time() - t0)
                if dt > 0:
                    time.sleep(dt)
            text = transcriber.process_chunk(chunk)
            if text != last:  # print-on-change (streaming_transcribe.py:54-59)
                print(text)
                last = text
        print("FINAL:", transcriber.flush())
        return

    try:
        import pyaudio  # type: ignore
    except ImportError:
        print("pyaudio not installed; use --simulate_file", file=sys.stderr)
        sys.exit(1)

    pa = pyaudio.PyAudio()
    last = [""]

    def callback(in_data, frame_count, time_info, status):
        import numpy as np

        chunk = np.frombuffer(in_data, dtype=np.int16).astype("float32") / 32768.0
        text = transcriber.process_chunk(chunk)
        if text != last[0]:
            print(text)
            last[0] = text
        return None, pyaudio.paContinue

    stream = pa.open(format=pyaudio.paInt16, channels=1,
                     rate=cfg.sample_rate, input=True,
                     frames_per_buffer=args.chunk_samples,
                     stream_callback=callback)
    print("listening (ctrl-c to stop)...")
    try:
        while stream.is_active():
            time.sleep(0.1)
    except KeyboardInterrupt:
        pass
    stream.close()
    pa.terminate()


if __name__ == "__main__":
    main()
