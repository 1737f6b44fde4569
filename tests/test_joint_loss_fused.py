"""Fused joint+loss vs the unfused joint_logits -> rnnt_loss_ref path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rnnt_tpu.ops.rnnt_loss_ref as ref
from rnnt_tpu.config import tiny_config
from rnnt_tpu.models import joint as joint_mod
from rnnt_tpu.ops.joint_loss_fused import (
    rnnt_loss_fused, transducer_loss_fused)
from rnnt_tpu.train.state import create_train_state
from rnnt_tpu.train.steps import make_train_step

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)



def _case(seed, B, T, U, P, J, V):
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(rng.standard_normal((B, T, P)), jnp.float32)
    pred = jnp.asarray(rng.standard_normal((B, U + 1, P)), jnp.float32)
    jp = {
        "w1": jnp.asarray(rng.standard_normal((P, J)) * 0.3, jnp.float32),
        "b1": jnp.asarray(rng.standard_normal(J) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((J, V)) * 0.3, jnp.float32),
        "b2": jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32),
    }
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    fl = jnp.asarray(rng.integers(max(1, T // 2), T + 1, (B,)), jnp.int32)
    yl = jnp.asarray(rng.integers(0, U + 1, (B,)), jnp.int32)
    return enc, pred, jp, labels, fl, yl


@pytest.mark.parametrize("B,T,U,P,J,V", [(2, 6, 3, 8, 16, 12), (3, 9, 5, 12, 8, 20)])
def test_fused_loss_matches_unfused(B, T, U, P, J, V):
    enc, pred, jp, labels, fl, yl = _case(B * 10 + T, B, T, U, P, J, V)
    logits = joint_mod.joint_logits(jp, enc, pred)
    loss_u = ref.rnnt_loss_ref(logits, labels, fl, yl)
    loss_f = transducer_loss_fused(jp, enc, pred, labels, fl, yl)
    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_u),
                               rtol=1e-4, atol=1e-4)


def test_fused_grads_match_unfused():
    B, T, U, P, J, V = 2, 5, 3, 8, 8, 10
    enc, pred, jp, labels, fl, yl = _case(3, B, T, U, P, J, V)

    def unfused(jp, enc, pred):
        logits = joint_mod.joint_logits(jp, enc, pred)
        return jnp.sum(ref.rnnt_loss_ref(logits, labels, fl, yl))

    def fused(jp, enc, pred):
        return jnp.sum(transducer_loss_fused(jp, enc, pred, labels, fl, yl))

    gu = jax.grad(unfused, argnums=(0, 1, 2))(jp, enc, pred)
    gf = jax.grad(fused, argnums=(0, 1, 2))(jp, enc, pred)
    for a, b in zip(jax.tree_util.tree_leaves(gu),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_train_step_fused_matches_ref():
    CFG = tiny_config(learning_rate=0.02, grad_clip_norm=1.0)
    B, T, U = 4, 12, 4
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(1, CFG.vocab_size, (B, U)), jnp.int32)
    batch = {
        "mel_specs": jnp.asarray(
            rng.standard_normal((B, T, CFG.input_feat_size)), jnp.float32),
        "pred_inp": jnp.concatenate([jnp.zeros((B, 1), jnp.int32), labels], 1),
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    results = {}
    for impl in ["ref", "fused"]:
        state = create_train_state(jax.random.PRNGKey(0), CFG)
        step = make_train_step(CFG, loss_impl=impl, donate=False)
        losses = []
        for _ in range(4):
            state, m = step(state, batch, key)
            losses.append(float(m["loss"]))
        results[impl] = (losses, state)
    np.testing.assert_allclose(results["fused"][0], results["ref"][0],
                               rtol=1e-4, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(results["ref"][1].params),
                    jax.tree_util.tree_leaves(results["fused"][1].params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
