"""Integration: the jitted train step reduces the loss on synthetic data.

(The reference has no such test — SURVEY.md §4 test-pyramid plan.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.train.state import create_train_state
from rnnt_tpu.train.steps import make_train_step, make_eval_step

CFG = tiny_config(learning_rate=0.02, grad_clip_norm=1.0)


def synth_batch(key, B=4, T=12, U=4):
    k1, k2 = jax.random.split(key)
    mel = jax.random.normal(k1, (B, T, CFG.input_feat_size))
    labels = jax.random.randint(k2, (B, U), 1, CFG.vocab_size).astype(jnp.int32)
    pred_inp = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), labels], axis=1)  # preprocessing.py:181
    return {
        "mel_specs": mel,
        "pred_inp": pred_inp,
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }


def test_loss_decreases():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step_fn = make_train_step(CFG, donate=False)
    batch = synth_batch(jax.random.PRNGKey(1))
    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(20):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 20
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < losses[0] * 0.85, losses


def test_eval_step_runs():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    eval_fn = make_eval_step(CFG)
    batch = synth_batch(jax.random.PRNGKey(3))
    m = eval_fn(state.params, batch)
    assert np.isfinite(float(m["loss"]))
    assert m["nll"].shape == (4,)
