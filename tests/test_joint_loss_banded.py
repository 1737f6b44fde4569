"""Banded (pruned) fused loss vs the exact full-lattice implementations.

ops/joint_loss_banded.py computes the joint V-reduction only in a label
window around the expected alignment diagonal; these tests pin its two
defining properties: EXACT for band >= U+1 (values and gradients), and a
finite upper bound on the exact NLL for any narrower band."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.config import tiny_config
from rnnt_tpu.ops.joint_loss_banded import rnnt_loss_banded
from rnnt_tpu.ops.joint_loss_fused import rnnt_loss_fused

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)



def _problem(B=4, T=40, U=20, J=16, V=24, seed=1):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal((B, T, J)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, U + 1, J)) * 0.5, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(J) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((J, V)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(V) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    tl = jnp.asarray([T, 3 * T // 4, T, T // 2], jnp.int32)[:B]
    ll = jnp.asarray([U, 3 * U // 4, U, U // 3], jnp.int32)[:B]
    return f, g, b1, w2, b2, labels, tl, ll


def test_wide_band_is_exact():
    f, g, b1, w2, b2, labels, tl, ll = _problem()
    full = rnnt_loss_fused(f, g, b1, w2, b2, labels, tl, ll)
    wide = rnnt_loss_banded(f, g, b1, w2, b2, labels, tl, ll,
                            band=labels.shape[1] + 1)
    np.testing.assert_allclose(np.asarray(wide), np.asarray(full),
                               rtol=1e-5, atol=1e-4)


def test_wide_band_gradients_match_fused():
    f, g, b1, w2, b2, labels, tl, ll = _problem(T=16, U=8)

    def lb(a):
        return jnp.sum(rnnt_loss_banded(*a, labels, tl, ll,
                                        band=labels.shape[1] + 1))

    def lf(a):
        return jnp.sum(rnnt_loss_fused(*a, labels, tl, ll))

    gb = jax.grad(lb)((f, g, b1, w2, b2))
    gf = jax.grad(lf)((f, g, b1, w2, b2))
    for a, b in zip(gb, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("band", [8, 16])
def test_narrow_band_upper_bounds_exact_nll(band):
    f, g, b1, w2, b2, labels, tl, ll = _problem()
    full = np.asarray(rnnt_loss_fused(f, g, b1, w2, b2, labels, tl, ll))
    banded = np.asarray(rnnt_loss_banded(f, g, b1, w2, b2, labels, tl, ll,
                                         band=band))
    assert np.all(np.isfinite(banded))
    assert np.all(banded >= full - 1e-4)  # pruned paths only remove mass
    # widening the band tightens the bound
    wider = np.asarray(rnnt_loss_banded(f, g, b1, w2, b2, labels, tl, ll,
                                        band=band + 8))
    assert np.all(wider <= banded + 1e-4)


def test_narrow_band_gradients_finite_and_shaped():
    f, g, b1, w2, b2, labels, tl, ll = _problem()
    grads = jax.grad(
        lambda a: jnp.sum(rnnt_loss_banded(*a, labels, tl, ll, band=8))
    )((f, g, b1, w2, b2))
    for got, ref in zip(grads, (f, g, b1, w2, b2)):
        assert got.shape == ref.shape
        assert bool(jnp.all(jnp.isfinite(got)))


def test_banded_train_step_learns():
    """Tiny overfit through the full train-step wiring (loss_impl='banded')."""
    from rnnt_tpu.train.state import create_train_state
    from rnnt_tpu.train.steps import make_train_step

    cfg = tiny_config(
        vocab_size=8, encoder_layers=2, encoder_size=24, projection_size=16,
        pred_net_layers=1, pred_net_size=24, joint_size=16, embedding_size=8,
        mel_bins=6, learning_rate=0.1, grad_clip_norm=1.0, loss_band=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, loss_impl="banded", donate=False)
    B, T, U = 2, 8, 2
    rng = np.random.default_rng(5)
    labels = jnp.asarray([[3, 5], [6, 2]], jnp.int32)
    batch = {
        "mel_specs": jnp.asarray(
            rng.standard_normal((B, T, cfg.input_feat_size)), jnp.float32),
        "pred_inp": jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), labels], axis=1),
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < losses[0] * 0.7, losses
