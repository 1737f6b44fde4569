"""Model shape/semantics tests: LSTM, TimeReduction, encoder, pred net, joint."""

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.models import lstm as L
from rnnt_tpu.models import encoder as enc_mod
from rnnt_tpu.models import prediction as pred_mod
from rnnt_tpu.models import joint as joint_mod
from rnnt_tpu.models.transducer import Transducer, init_transducer_params, param_count

CFG = tiny_config()


def test_time_reduction_shapes_and_padding():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    y = L.time_reduction(x, 2)
    assert y.shape == (2, 3, 6)  # ceil(5/2)=3, pad with zeros
    np.testing.assert_allclose(np.asarray(y[0, 0, :3]), np.asarray(x[0, 0]))
    np.testing.assert_allclose(np.asarray(y[0, 0, 3:]), np.asarray(x[0, 1]))
    np.testing.assert_allclose(np.asarray(y[0, 2, 3:]), 0.0)  # padded tail
    np.testing.assert_array_equal(
        np.asarray(L.reduced_length(jnp.array([5, 4, 1]), 2)), [3, 2, 1])


def test_lstm_layer_statefulness():
    """Chunked (stateful) execution == full-sequence execution."""
    key = jax.random.PRNGKey(0)
    p = L.init_lstm_params(key, 8, 16, 12)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    full, _ = L.lstm_layer(p, x)
    part1, st = L.lstm_layer(p, x[:, :4])
    part2, _ = L.lstm_layer(p, x[:, 4:], st)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([part1, part2], 1)),
        rtol=2e-5, atol=2e-5)


def test_encoder_output_shape():
    key = jax.random.PRNGKey(0)
    p = enc_mod.init_encoder_params(key, CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, CFG.input_feat_size))
    out, state, _ = enc_mod.encode(p, CFG, x)
    # 2 layers, reduction by 2 after layer idx 1 => T' = ceil(9/2) = 5
    assert out.shape == (2, 5, CFG.projection_size)
    assert len(state) == CFG.encoder_layers


def test_prediction_shape_and_step_equivalence():
    key = jax.random.PRNGKey(0)
    p = pred_mod.init_prediction_params(key, CFG)
    tokens = jnp.array([[0, 3, 7, 2], [0, 1, 1, 4]], jnp.int32)
    full, _ = pred_mod.predict(p, CFG, tokens)
    assert full.shape == (2, 4, CFG.projection_size)
    # step-by-step with carried state must match the batched run
    st = pred_mod.prediction_zero_state(CFG, 2)
    outs = []
    for u in range(4):
        o, st = pred_mod.predict(p, CFG, tokens[:, u:u + 1], state=st)
        outs.append(o[:, 0])
    stepped = jnp.stack(outs, 1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               rtol=2e-5, atol=2e-5)


def test_joint_logits_matches_naive_broadcast():
    """Linear-split optimization == reference broadcast-add formulation."""
    key = jax.random.PRNGKey(0)
    p = joint_mod.init_joint_params(key, CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 5, CFG.projection_size))
    pred = jax.random.normal(jax.random.PRNGKey(2), (2, 3, CFG.projection_size))
    fast = joint_mod.joint_logits(p, enc, pred)
    # naive: add first, then dense (model.py:158-166)
    joint_inp = enc[:, :, None, :] + pred[:, None, :, :]
    naive = jnp.tanh(joint_inp @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
    assert fast.shape == (2, 5, 3, CFG.vocab_size)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               rtol=1e-3, atol=1e-3)
    # single-cell step matches the full lattice cell
    step = joint_mod.joint_step(p, enc[:, 1, :], pred[:, 2, :])
    np.testing.assert_allclose(np.asarray(step), np.asarray(fast[:, 1, 2]),
                               rtol=1e-3, atol=1e-3)


def test_transducer_apply():
    model = Transducer(CFG)
    params = init_transducer_params(jax.random.PRNGKey(0), CFG)
    assert param_count(params) > 0
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, CFG.input_feat_size))
    pred_inp = jnp.array([[0, 5, 2], [0, 9, 1]], jnp.int32)
    logits, _ = model.apply(params, mel, pred_inp)
    assert logits.shape == (2, 4, 3, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
