"""Pallas LSTM sequence kernels vs the scan implementation (interpret mode)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.models import lstm as L
from rnnt_tpu.ops.lstm_pallas import lstm_seq


def _setup(seed=0, B=8, T=6, F=8, H=16, P=12):
    key = jax.random.PRNGKey(seed)
    params = L.init_lstm_params(key, F, H, P)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, F))
    state = L.lstm_zero_state(B, H, P)
    return params, x, state


def test_forward_matches_scan():
    params, x, state = _setup()
    ref_out, (ref_c, ref_h) = L.lstm_layer(params, x, state)
    out, (c_fin, h_fin) = lstm_seq(params, x, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_fin), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_fin), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)


def test_forward_nonzero_state():
    params, x, _ = _setup(3)
    B, H, P = 8, 16, 12
    state = (jax.random.normal(jax.random.PRNGKey(7), (B, H)),
             jax.random.normal(jax.random.PRNGKey(8), (B, P)))
    ref_out, _ = L.lstm_layer(params, x, state)
    out, _ = lstm_seq(params, x, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gradients_match_scan():
    params, x, state = _setup(5)

    def loss_scan(p, x):
        out, _ = L.lstm_layer(p, x, None)
        return jnp.sum(out ** 2)

    def loss_pallas(p, x):
        B = x.shape[0]
        st = L.lstm_zero_state(B, p["wh"].shape[1] // 4, p["wp"].shape[1])
        out, _ = lstm_seq(p, x, st)
        return jnp.sum(out ** 2)

    gs = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_gradient_through_final_h():
    """Cotangent on the final hidden state must reach weights and inputs."""
    params, x, state = _setup(9)

    def loss_scan(p, x):
        _, (c, h) = L.lstm_layer(p, x, None)
        return jnp.sum(h ** 2)

    def loss_pallas(p, x):
        st = L.lstm_zero_state(x.shape[0], 16, 12)
        _, (c, h) = lstm_seq(p, x, st)
        return jnp.sum(h ** 2)

    gs = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_infer_matches_train_forward():
    from rnnt_tpu.ops.lstm_pallas import lstm_seq_infer

    params, x, state = _setup(11)
    out_train, (c1, h1) = lstm_seq(params, x, state)
    out_infer, (c2, h2) = lstm_seq_infer(params, x, state)
    np.testing.assert_allclose(np.asarray(out_infer), np.asarray(out_train),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               rtol=1e-6, atol=1e-6)


def test_lstm_impl_knob(monkeypatch):
    """impl='scan' must not touch the Pallas kernel (TP meshes rely on it);
    impl='pallas' must force it even where the auto heuristic says no."""
    import rnnt_tpu.models.lstm as L
    import rnnt_tpu.ops.lstm_pallas as lp

    rng = np.random.default_rng(0)
    params = {
        "wx": jnp.asarray(rng.standard_normal((8, 4 * 128)) * 0.1, jnp.float32),
        "wh": jnp.asarray(rng.standard_normal((128, 4 * 128)) * 0.1, jnp.float32),
        "bias": jnp.zeros((4 * 128,), jnp.float32),
        "wp": jnp.asarray(rng.standard_normal((128, 128)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((8, 12, 8)), jnp.float32)

    called = []
    real = lp.lstm_seq
    monkeypatch.setattr(lp, "lstm_seq",
                        lambda *a, **k: called.append(1) or real(*a, **k))

    out_scan, _ = L.lstm_layer(params, x, None, impl="scan")
    assert not called
    out_pallas, _ = L.lstm_layer(params, x, None, impl="pallas")
    assert called
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_scan),
                               rtol=1e-4, atol=1e-4)
