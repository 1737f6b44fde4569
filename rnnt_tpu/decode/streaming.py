"""Streaming (chunked) transcription with carried state.

Re-design of streaming_transcribe.py: the reference relied on Keras
`stateful=True` LSTMs (batch 1) so each audio-callback chunk continued the
previous state (:34,41-61).  Here the state is an explicit pytree —
(encoder LSTM states, decode carry, feature remainder) — threaded through
`StreamingTranscriber.process_chunk`, so the same code serves a microphone
callback, a websocket server loop, or batch simulation in tests.

Chunk handling details the Keras version got subtly wrong:
- STFT frames straddling chunk boundaries: we keep a sample remainder of
  (frame_length - frame_step) so no frames are dropped between chunks
  (the reference featurized each chunk independently, losing boundary
  context, streaming_transcribe.py:44-50).
- frame stacking (x3) and TimeReduction (x2) alignment: leftover frames that
  don't fill a stack ride in the remainder as samples.
- per-feature normalization: training features are whole-utterance
  mean-subtracted (preprocessing.py:79), a statistic that doesn't exist
  mid-stream.  The reference normalized every chunk by its own mean —
  wildly off-distribution for ~64 ms chunks.  Here a causal running mean
  accumulates over the stream (exact at stream end, noisier early), and
  held-back remainder frames stay raw so they're re-normalized with the
  best mean available when finally fed.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.decode.greedy import greedy_decode_encoded
from rnnt_tpu.models.transducer import Transducer
from rnnt_tpu.ops import features as F


_RUN_CACHE = {}


def _chunk_program(cfg: RNNTConfig, max_tokens_per_chunk: int):
    """Jitted per-chunk encode+decode program, cached PER CONFIG (not per
    StreamingTranscriber): a fresh jit closure per TCP session would
    re-trace/compile on every new connection while holding the shared
    device lock, stalling all traffic for the compile (ADVICE r3).  All
    sessions with the same (cfg, token cap) now share one callable, so
    jit's shape-keyed executable cache persists across connections."""
    key = (cfg, max_tokens_per_chunk)
    if key not in _RUN_CACHE:
        model = Transducer(cfg)

        def _run(params, mel, enc_state, carry, n_valid):
            encoded, new_enc_state = model.encode(
                params, mel[None], state=enc_state)
            # n_valid bounds decode to encoder frames backed by REAL audio:
            # flush() pads the stream tail with zeros to push the held-back
            # remainders through the stacking/reduction boundaries, and
            # decoding the pure-pad frames emits spurious tokens (digital
            # silence is off-distribution after mean subtraction — measured
            # one hallucinated trailing letter on 12/24 streamed utterances
            # before this bound).  Offline decode has the same bound via
            # spec_lengths; mid-stream chunks pass n_valid >= chunk length.
            enc_len = jnp.minimum(
                jnp.full((1,), encoded.shape[1], jnp.int32),
                jnp.asarray(n_valid, jnp.int32).reshape(1))
            tokens, lengths, new_carry = greedy_decode_encoded(
                model, params, encoded, enc_len,
                max_output_length=max_tokens_per_chunk, carry=carry)
            return tokens[0], lengths[0], new_enc_state, new_carry

        _RUN_CACHE[key] = jax.jit(_run)
    return _RUN_CACHE[key]


class StreamingTranscriber:
    """Stateful chunk-by-chunk transcription (batch 1)."""

    def __init__(self, cfg: RNNTConfig, params, tokenizer,
                 *, max_tokens_per_chunk: int = 64,
                 prime_seconds: float = 0.5, device_lock=None):
        """prime_seconds: buffer this much audio before the first decode so
        the causal feature mean starts from a usable estimate.  The first
        chunks of a stream are mostly leading silence/noise; normalizing by
        their statistics alone is wildly off the whole-utterance mean the
        model trained with, and was measured to inject spurious tokens at
        stream start (offline WER 0.125 vs streamed 0.625 on the overfit
        tone corpus; 0 delta with priming — tests/test_beam_stream_ckpt).
        Costs one-time first-output latency; 0 disables."""
        self.cfg = cfg
        self.model = Transducer(cfg)
        self.params = params
        self.tokenizer = tokenizer
        self.max_tokens_per_chunk = max_tokens_per_chunk
        self.prime_samples = int(prime_seconds * cfg.sample_rate)
        # Optional lock serializing device access with other users of the
        # same chip (rnnt_tpu.serve shares one lock across HTTP requests and
        # all streaming sessions); None = caller owns the device.
        self._device_lock = device_lock
        self.reset()

        # The per-chunk compute is jitted once per (cfg, chunk length) and
        # SHARED across transcriber instances (_chunk_program): feeding
        # fixed-size chunks (e.g. 1024 samples like streaming_transcribe.py:17)
        # hits the cache every time, including across TCP sessions.
        self._run = _chunk_program(cfg, max_tokens_per_chunk)

    def reset(self) -> None:
        self._primed = self.prime_samples == 0
        self._prime_buf = np.zeros((0,), np.float32)
        self._sample_rem = np.zeros((0,), np.float32)  # boundary samples
        self._frame_rem = np.zeros((0, self.cfg.mel_bins), np.float32)
        # stacked frames held back so each encode() sees a multiple of the
        # time-reduction factor (keeps chunked == full-utterance exact);
        # held RAW — normalization happens at feed time with the mean then
        # available
        self._stacked_rem = np.zeros((0, self.cfg.input_feat_size), np.float32)
        # causal running mean for per-feature normalization: training data
        # was whole-utterance mean-subtracted (preprocessing.py:79), so the
        # stream must converge to that statistic rather than normalize each
        # tiny chunk by its own mean (the reference's per-chunk featurization
        # fed the model wildly off-distribution features)
        self._lm_sum = np.zeros((self.cfg.mel_bins,), np.float64)
        self._lm_count = 0
        self._enc_state = None
        self._carry = None
        self._text_ids: List[int] = []
        self._decoded_n = 0
        self._decoded_text = ""
        # real-audio accounting for the flush-pad decode bound (_run n_valid)
        self._real_samples = 0
        self._enc_done = 0  # encoder frames already decoded
        self._flushed = False

    @property
    def text(self) -> str:
        # re-decode only when new tokens arrived: most chunks emit nothing,
        # so a per-chunk full decode would do O(stream^2) tokenizer work
        if len(self._text_ids) != self._decoded_n:
            self._decoded_text = self.tokenizer.decode(self._text_ids)
            self._decoded_n = len(self._text_ids)
        return self._decoded_text

    def flush(self) -> str:
        """Drain the held-back tail at end of stream.

        The remainders (boundary samples < one frame, frames not filling a
        stack, stacked frames not filling a TimeReduction pair) can hold the
        last ~75 ms of audio — typically the final word piece.  Push enough
        zero samples (silence) to complete every alignment boundary so the
        real tail gets decoded; returns the final transcript."""
        cfg = self.cfg
        if not self._primed:  # short stream: force the buffered audio out
            self._primed = True
            pending, self._prime_buf = self._prime_buf, np.zeros((0,), np.float32)
            self.process_chunk(pending, real=False)  # counted at buffering
        r = cfg.time_reduction_factor if cfg.time_reduction_index >= 0 else 1
        pad = (cfg.frame_length_samples
               + cfg.frame_step_samples * cfg.downsample_factor * (r + 1))
        # real=False: the zero pad exists only to push the real tail through
        # the stacking/reduction boundaries; frames made purely of it are
        # excluded from decode by the n_valid bound (see _chunk_program)
        out = self.process_chunk(np.zeros(pad, np.float32), real=False)
        # Terminal: the pad frames advanced _enc_done past the real-audio
        # bound AND pushed zeros through the LSTM state, so appending more
        # real audio would both lag n_valid and decode against polluted
        # state (ADVICE r4).  A new utterance starts with reset().
        self._flushed = True
        return out

    def _valid_enc_frames(self) -> int:
        """Upper bound on encoder-output frames backed by real audio."""
        cfg = self.cfg
        frames = -(-self._real_samples // cfg.frame_step_samples)
        stacked = -(-frames // cfg.downsample_factor)
        r = cfg.time_reduction_factor if cfg.time_reduction_index >= 0 else 1
        return -(-stacked // r)

    def process_chunk(self, samples: np.ndarray, real: bool = True) -> str:
        """Feed raw audio samples; returns the transcript so far.

        real=False marks filler samples (flush padding / prime re-feeds)
        that must not extend the decoded region of the stream."""
        cfg = self.cfg
        if self._flushed and real:
            raise RuntimeError(
                "process_chunk after flush(): flush is terminal (its zero "
                "pad is already in the encoder state) — call reset() before "
                "streaming a new utterance")
        if real:
            self._real_samples += len(samples)
        if not self._primed:
            self._prime_buf = np.concatenate(
                [self._prime_buf, np.asarray(samples, np.float32)])
            if len(self._prime_buf) < self.prime_samples:
                return self.text
            samples, self._prime_buf = self._prime_buf, np.zeros((0,), np.float32)
            self._primed = True
        buf = np.concatenate([self._sample_rem, np.asarray(samples, np.float32)])

        frame_len, step = cfg.frame_length_samples, cfg.frame_step_samples
        n_frames = max(0, 1 + (len(buf) - frame_len) // step)
        # frames whose windows are complete in this buffer
        if n_frames == 0:
            self._sample_rem = buf
            return self.text
        consumed = n_frames * step
        self._sample_rem = buf[consumed:]

        # Raw log-mels; normalization below uses the causal running mean so
        # the features converge to the whole-utterance statistics training
        # used (exact at stream end; early frames see a noisier estimate —
        # the price of causality).
        log_mel = np.asarray(F.log_mel_spectrogram(
            jnp.asarray(buf[: consumed + (frame_len - step)]), cfg,
            mean_subtract=False))
        self._lm_sum += log_mel.sum(axis=0, dtype=np.float64)
        self._lm_count += len(log_mel)
        mean = (self._lm_sum / max(self._lm_count, 1)).astype(np.float32)

        frames = np.concatenate([self._frame_rem, log_mel], 0)
        n_stack = (len(frames) // cfg.downsample_factor) * cfg.downsample_factor
        self._frame_rem = frames[n_stack:]
        mel_raw = np.concatenate([
            self._stacked_rem,
            frames[:n_stack].reshape(-1, cfg.input_feat_size)], 0)
        mel = mel_raw - np.tile(mean, cfg.downsample_factor)
        # feed a multiple of the reduction factor (exact state continuation)
        r = cfg.time_reduction_factor if cfg.time_reduction_index >= 0 else 1
        n_feed = (len(mel) // r) * r
        self._stacked_rem = mel_raw[n_feed:]  # raw: re-normalized next chunk
        if n_feed == 0:
            return self.text
        mel = mel[:n_feed]

        n_valid = max(0, self._valid_enc_frames() - self._enc_done)
        self._enc_done += n_feed // r
        if self._device_lock is not None:
            # Serialize both dispatch AND execution (block inside the lock):
            # on one chip this bounds a concurrent session's added latency to
            # one chunk's compute instead of an unbounded dispatch-queue race.
            with self._device_lock:
                out = self._run(self.params, jnp.asarray(mel),
                                self._enc_state, self._carry,
                                np.int32(n_valid))
                out = jax.block_until_ready(out)
            tokens, length, self._enc_state, self._carry = out
        else:
            tokens, length, self._enc_state, self._carry = self._run(
                self.params, jnp.asarray(mel), self._enc_state, self._carry,
                np.int32(n_valid))
        self._text_ids.extend(np.asarray(tokens)[: int(length)].tolist())
        return self.text


def streamed_vs_offline(cfg: RNNTConfig, params, tokenizer, utterances,
                        *, chunk_samples: int = 1024,
                        max_output_length: int = 256):
    """Decode (audio, sr, ref_text) utterances offline AND chunk-streamed.

    Measures the quality cost of causal streaming (the running-mean feature
    normalization is exact only at stream end — early chunks see a noisier
    estimate).  Returns (offline_wer, streamed_wer, details) where details
    is [(ref, offline_text, streamed_text)] — BASELINE.md records the delta
    over the held-out synthetic test set.

    Host memory is proportional to the utterance set (raw audio is buffered
    between the offline and streaming phases; `utterances` may be a
    one-shot generator).  This is an eval-set harness — bound it with the
    caller's max_utts, not a whole training corpus.
    """
    from rnnt_tpu.data.tokenizer import normalize_text
    from rnnt_tpu.decode.greedy import greedy_decode
    from rnnt_tpu.metrics import wer as wer_fn

    model = Transducer(cfg)

    @jax.jit
    def offline(params, mel, sl):
        return greedy_decode(model, params, mel, sl,
                             max_output_length=max_output_length)

    # Two phases, offline decode first, so the offline bucket programs and
    # the streaming per-chunk program are never resident together: at parity
    # scale the combined footprint RESOURCE_EXHAUSTED'd the chip mid-run
    # (round-4 hedge_evals.log tail).  Audio is kept on host between phases.
    refs, off_texts, str_texts = [], [], []
    audios = []
    for audio, sr, ref in utterances:
        assert sr == cfg.sample_rate
        audio = np.asarray(audio, np.float32)
        audios.append(audio)
        mel = np.asarray(F.preprocess_audio(jnp.asarray(audio), cfg))
        t = mel.shape[0]
        pad_t = -(-t // 128) * 128  # closed shape set: one compile per bucket
        mel_p = np.zeros((1, pad_t, mel.shape[1]), np.float32)
        mel_p[0, :t] = mel
        tokens, lengths = offline(params, jnp.asarray(mel_p),
                                  jnp.asarray([t], jnp.int32))
        off_texts.append(tokenizer.decode(
            np.asarray(tokens[0])[: int(lengths[0])].tolist()))
        refs.append(normalize_text(ref))

    # release the offline executables + their device workspaces before the
    # streaming programs compile (the per-chunk program is re-jitted below)
    del offline
    jax.clear_caches()

    st = StreamingTranscriber(cfg, params, tokenizer)
    for audio in audios:
        st.reset()
        for o in range(0, len(audio), chunk_samples):
            st.process_chunk(audio[o: o + chunk_samples])
        str_texts.append(st.flush())

    return (wer_fn(refs, off_texts), wer_fn(refs, str_texts),
            list(zip(refs, off_texts, str_texts)))
