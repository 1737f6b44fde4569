"""Audio feature frontend: STFT -> log-mel -> mean-sub -> frame stacking.

JAX re-implementation of utils/preprocessing.py:48-94 with tf.signal-equivalent
semantics, golden-tested against the TF ops (tests/golden):

- framing with no centering, num_frames = 1 + (N - frame_len)//step
  (tf.signal.stft), periodic Hann window, rfft at the next power of two;
- HTK mel filterbank matching tf.signal.linear_to_mel_weight_matrix
  (mel = 1127 * ln(1 + f/700), first FFT bin zeroed, triangles computed in
  mel space over linspace(mel_low, mel_high, n_mels + 2));
- log(mel + 1e-6) then per-feature mean subtraction over time (+1e-8)
  (preprocessing.py:78-79);
- downsample by stacking `downsample_factor` adjacent frames, truncating the
  tail (preprocessing.py:84-94 — note: truncate, unlike TimeReduction's pad).

Everything is jit-able and static-shaped given a fixed audio length; batch
feature extraction runs on device (the reference did this on CPU in tf.data).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import RNNTConfig


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def hertz_to_mel(f):
    return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def mel_weight_matrix(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: int,
    hertz_low: float,
    hertz_high: float,
) -> np.ndarray:
    """HTK-mel triangular filterbank, tf.signal.linear_to_mel_weight_matrix
    semantics (preprocessing.py:68-72). Returns [num_spectrogram_bins, n_mels]."""
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]  # zero bin 0
    spec_mels = hertz_to_mel(linear_freqs)[:, None]

    edges = np.linspace(hertz_to_mel(hertz_low), hertz_to_mel(hertz_high),
                        num_mel_bins + 2)
    lower, center, upper = edges[:-2][None, :], edges[1:-1][None, :], edges[2:][None, :]

    lower_slope = (spec_mels - lower) / (center - lower)
    upper_slope = (upper - spec_mels) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    return np.concatenate(
        [np.zeros((1, num_mel_bins)), weights], axis=0).astype(np.float32)


def stft_magnitude(audio: jnp.ndarray, frame_length: int, frame_step: int,
                   fft_length: int | None = None) -> jnp.ndarray:
    """|STFT| of mono audio [N] -> [num_frames, fft_length//2 + 1]."""
    if fft_length is None:
        fft_length = _next_pow2(frame_length)
    n = audio.shape[-1]
    num_frames = max(0, 1 + (n - frame_length) // frame_step)
    idx = (jnp.arange(num_frames)[:, None] * frame_step
           + jnp.arange(frame_length)[None, :])
    frames = audio[idx]
    window = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(frame_length) / frame_length)  # periodic Hann
    spec = jnp.fft.rfft(frames * window, n=fft_length, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)


def _pallas_frontend_eligible() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def log_mel_spectrogram(audio: jnp.ndarray, cfg: RNNTConfig,
                        mean_subtract: bool = True) -> jnp.ndarray:
    """Audio [N] float32 in [-1,1] -> log-mel [num_frames, mel_bins],
    per-feature mean-subtracted (preprocessing.py:48-81).

    On TPU this dispatches to the fused Pallas frontend (framing + windowed
    matmul-DFT + mel + log in one kernel, ops/features_pallas.py); the XLA
    rfft path below is the semantics anchor and the CPU/debug path.

    mean_subtract=False returns raw log-mels — the streaming path owns its
    normalization (a causal running mean; decode/streaming.py), since a
    whole-utterance mean doesn't exist mid-stream.
    """
    if _pallas_frontend_eligible():
        from rnnt_tpu.ops.features_pallas import log_mel_frontend

        log_mel = log_mel_frontend(audio, cfg)
    else:
        frame_length = cfg.frame_length_samples
        frame_step = cfg.frame_step_samples
        fft_length = _next_pow2(frame_length)
        mag = stft_magnitude(audio, frame_length, frame_step, fft_length)
        mel_mat = jnp.asarray(mel_weight_matrix(
            cfg.mel_bins, fft_length // 2 + 1, cfg.sample_rate,
            cfg.hertz_low, cfg.hertz_high))
        mel = jnp.dot(mag, mel_mat, preferred_element_type=jnp.float32)
        log_mel = jnp.log(mel + 1e-6)
    if not mean_subtract:
        return log_mel
    return log_mel - (jnp.mean(log_mel, axis=0) + 1e-8)


def stack_frames(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """[T, F] -> [T//n, F*n], truncating the tail (preprocessing.py:84-94)."""
    t, f = spec.shape
    trimmed = (t // n) * n
    return spec[:trimmed].reshape(t // n, f * n)


def preprocess_audio(audio: jnp.ndarray, cfg: RNNTConfig) -> jnp.ndarray:
    """Full frontend: audio [N] -> stacked log-mel [T, mel_bins * factor]
    (the preprocess_audio equivalent, preprocessing.py:238-253)."""
    return stack_frames(log_mel_spectrogram(audio, cfg), cfg.downsample_factor)


def num_feature_frames(n_samples: int, cfg: RNNTConfig) -> int:
    """Static output length of `preprocess_audio` for n input samples."""
    frames = max(0, 1 + (n_samples - cfg.frame_length_samples)
                 // cfg.frame_step_samples)
    return frames // cfg.downsample_factor
