"""Feature frontend vs tf.signal golden vectors (generated once; tests never
import TF). Covers STFT framing/window/fft, HTK mel filterbank, log + mean-sub,
and frame stacking (ref: utils/preprocessing.py:48-94)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.ops import features as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "features_tf.npz")
CFG = RNNTConfig()


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_mel_matrix_matches_tf(golden):
    ours = F.mel_weight_matrix(80, 257, 16000, 125.0, 7600.0)
    np.testing.assert_allclose(ours, golden["mel_matrix"], atol=5e-5)


@pytest.mark.parametrize("name", ["short", "one_sec", "odd"])
def test_stft_magnitude_matches_tf(golden, name):
    audio = jnp.asarray(golden[f"{name}_audio"])
    mag = F.stft_magnitude(audio, CFG.frame_length_samples, CFG.frame_step_samples)
    ref = golden[f"{name}_mag"]
    assert mag.shape == ref.shape
    np.testing.assert_allclose(np.asarray(mag), ref, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("name", ["short", "one_sec", "odd"])
def test_log_mel_matches_tf(golden, name):
    audio = jnp.asarray(golden[f"{name}_audio"])
    ours = F.log_mel_spectrogram(audio, CFG)
    ref = golden[f"{name}_logmel"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3, rtol=1e-3)


def test_stack_frames():
    x = jnp.arange(7 * 4, dtype=jnp.float32).reshape(7, 4)
    y = F.stack_frames(x, 3)
    assert y.shape == (2, 12)  # truncates, unlike TimeReduction (pads)
    np.testing.assert_allclose(np.asarray(y[0]), np.arange(12.0))


def test_preprocess_audio_shape():
    audio = jnp.zeros(16000)
    out = F.preprocess_audio(audio, CFG)
    assert out.shape == (F.num_feature_frames(16000, CFG), CFG.input_feat_size)
    assert out.shape == (32, 240)  # 98 frames // 3, 80 mel * 3
