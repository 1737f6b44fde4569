"""Fused Pallas feature frontend vs the XLA rfft reference path.

The Pallas kernel (ops/features_pallas.py) reformulates the reference's
tf.signal chain (utils/preprocessing.py:48-81) as windowed matmul-DFTs; these
tests pin it to the golden-tested XLA implementation (interpret mode on the
CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.config import RNNTConfig, tiny_config
from rnnt_tpu.ops import features as F
from rnnt_tpu.ops.features_pallas import (
    log_mel_frontend, log_mel_spectrogram_pallas, preprocess_audio_pallas)

CFG = RNNTConfig()


@pytest.mark.parametrize("n", [400, 560, 16000, 16000 * 4 + 37])
def test_log_mel_parity(n):
    rng = np.random.default_rng(n)
    audio = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    ref = F.log_mel_spectrogram(audio, CFG)
    got = log_mel_spectrogram_pallas(audio, CFG, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_too_short_audio_yields_zero_frames():
    audio = jnp.zeros((399,), jnp.float32)
    assert log_mel_frontend(audio, CFG, interpret=True).shape == (0, CFG.mel_bins)


def test_stacked_frontend_parity():
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal(16000) * 0.1, jnp.float32)
    ref = F.preprocess_audio(audio, CFG)
    got = preprocess_audio_pallas(audio, CFG, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_nondefault_geometry():
    # hop not dividing frame_length and non-16k rate exercise the chunk
    # remapping (n_cover overhang rows zeroed)
    cfg = tiny_config(sample_rate=8000, mel_bins=40)
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal(8000) * 0.1, jnp.float32)
    ref = F.log_mel_spectrogram(audio, cfg)
    got = log_mel_spectrogram_pallas(audio, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_jit_and_grad_free_path():
    # frontend is jit-able with static audio length
    rng = np.random.default_rng(11)
    audio = jnp.asarray(rng.standard_normal(8000) * 0.1, jnp.float32)
    fn = jax.jit(lambda a: log_mel_spectrogram_pallas(a, CFG, interpret=True))
    got = fn(audio)
    ref = F.log_mel_spectrogram(audio, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
