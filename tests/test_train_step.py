"""Integration: the jitted train step reduces the loss on synthetic data.

(The reference has no such test — SURVEY.md §4 test-pyramid plan.)
"""

import jax
import pytest
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


def test_adam_optimizer_trains():
    """optimizer="adam" (beyond-ref, the parity-depth convergence fix):
    state creates, steps run, loss decreases, resume layout roundtrips."""
    cfg = tiny_config(learning_rate=1e-3, grad_clip_norm=1.0,
                      optimizer="adam")
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, donate=False)
    batch = synth_batch(jax.random.PRNGKey(1))
    losses = []
    rng = jax.random.PRNGKey(2)
    for _ in range(20):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < losses[0] * 0.9, losses


def test_init_blank_bias():
    """init_blank_bias seeds b2[0]; 0.0 keeps the exact reference init."""
    from rnnt_tpu.models.transducer import init_transducer_params

    cfg = tiny_config(init_blank_bias=-4.0)
    p = init_transducer_params(jax.random.PRNGKey(0), cfg)
    b2 = np.asarray(p["joint"]["b2"])
    assert b2[0] == -4.0 and np.all(b2[1:] == 0.0)
    p0 = init_transducer_params(jax.random.PRNGKey(0), tiny_config())
    assert np.all(np.asarray(p0["joint"]["b2"]) == 0.0)


def test_eval_step_runs():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    eval_fn = make_eval_step(CFG)
    batch = synth_batch(jax.random.PRNGKey(3))
    m = eval_fn(state.params, batch)
    assert np.isfinite(float(m["loss"]))
    assert m["nll"].shape == (4,)


@pytest.mark.slow
def test_loss_weight_masks_fillers():
    """Filler rows (loss_weight 0) contribute neither loss nor gradient."""
    from rnnt_tpu.train.steps import batch_loss
    import jax

    real = synth_batch(jax.random.PRNGKey(7), B=4)
    state = create_train_state(jax.random.PRNGKey(0), CFG)

    # batch of 4 where rows 2,3 are garbage fillers with weight 0
    padded = {k: np.asarray(v).copy() for k, v in real.items()}
    padded["mel_specs"][2:] = 999.0
    padded["spec_lengths"][2:] = 1
    padded["label_lengths"][2:] = 0
    padded["loss_weight"] = np.array([1, 1, 0, 0], np.float32)
    padded = {k: jnp.asarray(v) for k, v in padded.items()}

    only_real = {k: jnp.asarray(np.asarray(v)[:2]) for k, v in real.items()}

    loss_pad, _ = batch_loss(state.params, CFG, padded, training=False)
    loss_real, _ = batch_loss(state.params, CFG, only_real, training=False)
    np.testing.assert_allclose(float(loss_pad), float(loss_real),
                               rtol=1e-5, atol=1e-5)

    g_pad = jax.grad(lambda p: batch_loss(p, CFG, padded, training=False)[0])(
        state.params)
    g_real = jax.grad(lambda p: batch_loss(p, CFG, only_real,
                                           training=False)[0])(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pad),
                    jax.tree_util.tree_leaves(g_real)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_lr_schedule_warmup_cosine():
    """Warmup ramps 0 -> peak over warmup_steps, cosine decays to the floor;
    the train step reports the schedule lr and the optimizer applies it
    (a zero-lr first step must not move the trainable params)."""
    from rnnt_tpu.train.state import lr_schedule, trainable

    cfg = CFG.replace(learning_rate=0.1, warmup_steps=10,
                      lr_schedule="cosine", decay_steps=40,
                      lr_final_factor=0.1)
    sched = lr_schedule(cfg)
    lrs = np.asarray([sched(t) for t in range(60)])
    assert lrs[0] == 0.0
    assert np.all(np.diff(lrs[:10]) > 0)
    np.testing.assert_allclose(lrs[10], 0.1, rtol=1e-6)
    assert np.all(np.diff(lrs[10:50]) < 0)            # cosine decay
    np.testing.assert_allclose(lrs[50:], 0.01, rtol=1e-5)  # floor reached

    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, donate=False)
    batch = synth_batch(jax.random.PRNGKey(1))
    before = jax.tree_util.tree_map(np.asarray, trainable(state.params))
    state2, m = step_fn(state, batch, jax.random.PRNGKey(2))
    assert float(m["lr"]) == 0.0                      # step 0 is warmup start
    after = jax.tree_util.tree_map(np.asarray, trainable(state2.params))
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    _, m2 = step_fn(state2, batch, jax.random.PRNGKey(3))
    assert float(m2["lr"]) > 0.0                      # ramp has begun


def test_constant_lr_keeps_round1_opt_state_layout():
    """Default config must not grow opt_state (checkpoint compat: the
    schedule path adds a count leaf only when a schedule is requested)."""
    plain = create_train_state(jax.random.PRNGKey(0), CFG)
    sched = create_train_state(
        jax.random.PRNGKey(0), CFG.replace(warmup_steps=5))
    n_plain = len(jax.tree_util.tree_leaves(plain.opt_state))
    n_sched = len(jax.tree_util.tree_leaves(sched.opt_state))
    assert n_sched == n_plain + 1
