"""Fused Pallas TPU kernel for the audio feature frontend.

One kernel covers framing -> Hann window -> DFT -> |.| -> mel filterbank ->
log, the compute body of the reference's tf.signal pipeline
(utils/preprocessing.py:48-81).  TPU-first formulation:

- The rFFT becomes TWO MXU MATMULS: real/imag DFT matrices with the periodic
  Hann window folded into their rows (|FFT(w*x)| = sqrt((x@C')^2 + (x@S')^2),
  C'[k,f] = hann[k] cos(2*pi*k*f/nfft)).  At frame_length 400 the
  [frames, 480] x [480, 384] products align with the 128-lane MXU far better
  than a radix butterfly would, and the mel projection [384 -> 128 lanes]
  chains as a third matmul without leaving VMEM.
- Overlapping frames (length 400, hop 160) never touch HBM: audio arrives as
  hop-sized chunks [n_chunks, 160] resident in VMEM and each frame tile is
  assembled with three shifted sublane views (frame f = chunks f, f+1, f+2 —
  rows >= frame_length of the DFT matrices are zero, masking the overhang).
- Per-feature mean subtraction is a cheap [F, mel] elementwise pass left to
  XLA outside (it needs a full-time reduction and contributes no FLOPs worth
  fusing).

Everything stays in VMEM for utterances up to minutes long (16 s of audio:
1.1 MB of chunks + 1.5 MB of DFT matrices).  The pure-JAX path in
ops/features.py remains the semantics anchor; parity is tested to ~1e-4
(fp32 matmul-DFT vs rfft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.ops import features as F


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _dft_mats(frame_length: int, fft_length: int, hop: int, chunk_w: int,
              n_cover: int, num_mel: int, sample_rate: int, hertz_low: float,
              hertz_high: float):
    """Windowed DFT (real, imag) [n_cover*chunk_w, Kp] and mel [Kp, Mp] mats.

    The kernel sees frames as n_cover concatenated chunk rows, each padded
    from `hop` to `chunk_w` lanes (128-aligned); matrix row j*chunk_w + k is
    the windowed DFT coefficient of frame sample j*hop + k when k < hop and
    j*hop + k < frame_length, zero otherwise — lane padding and the last
    chunk's overhang contribute exactly nothing.  Same for the mel matrix's
    bin/mel padding.
    """
    n_bins = fft_length // 2 + 1
    Kp = _round_up(n_bins, 128)
    Mp = _round_up(num_mel, 128)
    k = np.arange(frame_length, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / frame_length)  # periodic
    ang = 2.0 * np.pi * k * f / fft_length
    cos_s = (hann * np.cos(ang)).astype(np.float32)   # [frame_length, n_bins]
    sin_s = (-hann * np.sin(ang)).astype(np.float32)
    cos = np.zeros((n_cover * chunk_w, Kp), np.float32)
    sin = np.zeros((n_cover * chunk_w, Kp), np.float32)
    for j in range(n_cover):
        lo, hi = j * hop, min((j + 1) * hop, frame_length)
        if lo >= hi:
            continue
        cos[j * chunk_w: j * chunk_w + (hi - lo), :n_bins] = cos_s[lo:hi]
        sin[j * chunk_w: j * chunk_w + (hi - lo), :n_bins] = sin_s[lo:hi]
    mel = np.zeros((Kp, Mp), np.float32)
    mel[:n_bins, :num_mel] = F.mel_weight_matrix(
        num_mel, n_bins, sample_rate, hertz_low, hertz_high)
    return cos, sin, mel


def _frontend_kernel(*refs):
    """One tile of Ft frames: n_cover shifted chunk views (separate inputs,
    no in-kernel dynamic slicing) -> DFT matmuls -> mel matmul -> log."""
    chunk_refs = refs[:-4]
    cos_ref, sin_ref, mel_ref, out_ref = refs[-4:]
    frames = jnp.concatenate([r[...] for r in chunk_refs], axis=1)
    # HIGHEST: full-fp32 MXU passes — bf16-precision DFT noise is amplified
    # by the log at near-silent mel bins
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)                  # [Ft, Kp]
    mel = jnp.dot(mag, mel_ref[...], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log(mel + 1e-6)


def _interpret_default() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def log_mel_frontend(audio: jnp.ndarray, cfg: RNNTConfig, *,
                     frame_tile: int = 128,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Fused frontend: audio [N] -> log-mel [F, mel_bins] (pre mean-sub).

    Matches ops/features.log_mel_spectrogram semantics up to the final
    per-feature mean subtraction (preprocessing.py:78-79), which the caller
    applies; F = 1 + (N - frame_length)//frame_step (tf.signal.stft, no
    centering).
    """
    if interpret is None:
        interpret = _interpret_default()
    flen = cfg.frame_length_samples
    hop = cfg.frame_step_samples
    n_cover = -(-flen // hop)  # ceil: chunks spanned by one frame
    fft_length = 1 << (flen - 1).bit_length()
    n_bins = fft_length // 2 + 1
    Kp = _round_up(n_bins, 128)
    Mp = _round_up(cfg.mel_bins, 128)

    N = audio.shape[-1]
    Fr = max(0, 1 + (N - flen) // hop)
    if Fr == 0:
        return jnp.zeros((0, cfg.mel_bins), jnp.float32)
    Ft = min(frame_tile, _round_up(Fr, 8))
    Fp = _round_up(Fr, Ft)
    W = _round_up(hop, 128)  # lane-aligned chunk width
    # chunk rows needed: frame Fp-1 spans chunks Fp-1 .. Fp-1 + n_cover-1
    n_chunks = Fp + n_cover - 1
    pad = n_chunks * hop - N
    audio = jnp.pad(audio.astype(jnp.float32), (0, max(0, pad)))
    chunks = audio[: n_chunks * hop].reshape(n_chunks, hop)
    chunks = jnp.pad(chunks, ((0, 0), (0, W - hop)))
    # n_cover shifted views (XLA slices outside; kernel slicing stays static)
    shifted = [chunks[j: j + Fp] for j in range(n_cover)]

    cos, sin, mel = _dft_mats(flen, fft_length, hop, W, n_cover,
                              cfg.mel_bins, cfg.sample_rate, cfg.hertz_low,
                              cfg.hertz_high)

    full = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((Ft, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _frontend_kernel,
        grid=(Fp // Ft,),
        in_specs=[tile] * n_cover + [
            full(n_cover * W, Kp),
            full(n_cover * W, Kp),
            full(Kp, Mp),
        ],
        out_specs=pl.BlockSpec((Ft, Mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Mp), jnp.float32),
        interpret=interpret,
    )(*shifted, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(mel))
    return out[:Fr, : cfg.mel_bins]


def log_mel_spectrogram_pallas(audio: jnp.ndarray, cfg: RNNTConfig,
                               **kw) -> jnp.ndarray:
    """Drop-in for features.log_mel_spectrogram (incl. mean subtraction)."""
    log_mel = log_mel_frontend(audio, cfg, **kw)
    return log_mel - (jnp.mean(log_mel, axis=0) + 1e-8)


def preprocess_audio_pallas(audio: jnp.ndarray, cfg: RNNTConfig,
                            **kw) -> jnp.ndarray:
    """Full fused frontend + frame stacking (features.preprocess_audio)."""
    return F.stack_frames(log_mel_spectrogram_pallas(audio, cfg, **kw),
                          cfg.downsample_factor)
