"""Native C++ components: FLAC decoder and OpenMP CPU RNN-T loss.

The CPU loss doubles as an independent oracle for the JAX implementation
(warp-transducer test_cpu's role, cmake/warp-rnnt-cmakelist.txt:124-126).
"""

import numpy as np
import pytest

from tests.flac_fixture import encode_flac


@pytest.fixture(scope="module")
def native():
    from rnnt_tpu.native.build import load_library

    return load_library()


@pytest.mark.parametrize("subframe_type", ["verbatim", "constant", "fixed2"])
def test_flac_decode_roundtrip(native, tmp_path, subframe_type):
    rng = np.random.default_rng(42)
    n = 1000
    if subframe_type == "constant":
        samples = np.full(n, -1234, np.int64)
    elif subframe_type == "fixed2":
        # smooth ramp + noise: small order-2 residuals
        t = np.arange(n)
        samples = (100 * np.sin(t / 25) * 50 + rng.integers(-20, 20, n)).astype(np.int64)
    else:
        samples = rng.integers(-30000, 30000, n).astype(np.int64)

    path = str(tmp_path / f"{subframe_type}.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(samples, subframe_type=subframe_type))

    from rnnt_tpu.native.flac import read_flac

    audio, sr = read_flac(path)
    assert sr == 16000
    assert audio.shape == (n,)
    np.testing.assert_allclose(audio, samples / 32768.0, atol=1e-7)


def test_flac_via_audio_io(native, tmp_path):
    samples = np.random.default_rng(0).integers(-1000, 1000, 500).astype(np.int64)
    path = str(tmp_path / "x.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(samples))
    from rnnt_tpu.data.audio_io import read_audio

    audio, sr = read_audio(path)
    np.testing.assert_allclose(audio, samples / 32768.0, atol=1e-7)


def test_cpu_loss_matches_numpy_oracle(native):
    from rnnt_tpu.native.loss import rnnt_loss_cpu
    from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_numpy

    rng = np.random.default_rng(1)
    B, T, U, V = 3, 7, 4, 9
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    fl = np.array([T, T - 2, T - 1], np.int32)
    yl = np.array([U, U - 1, 0], np.int32)

    loss, _ = rnnt_loss_cpu(logits, labels, fl, yl)
    expected = rnnt_loss_numpy(logits, labels, fl, yl)
    np.testing.assert_allclose(loss, expected, rtol=1e-4, atol=1e-4)


def test_cpu_loss_grad_matches_jax(native):
    import jax
    import jax.numpy as jnp

    from rnnt_tpu.native.loss import rnnt_loss_cpu
    from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_ref

    rng = np.random.default_rng(2)
    B, T, U, V = 2, 5, 3, 6
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, (B, U)).astype(np.int32)
    fl = np.array([T, T - 1], np.int32)
    yl = np.array([U, U - 2], np.int32)

    loss_c, grad_c = rnnt_loss_cpu(logits, labels, fl, yl, with_grad=True)
    loss_j = rnnt_loss_ref(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray(fl), jnp.asarray(yl))
    grad_j = jax.grad(lambda x: jnp.sum(rnnt_loss_ref(
        x, jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl))))(
            jnp.asarray(logits))
    np.testing.assert_allclose(loss_c, np.asarray(loss_j), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(grad_c, np.asarray(grad_j), rtol=1e-3, atol=1e-4)
