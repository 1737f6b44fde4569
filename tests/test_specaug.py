"""SpecAugment masking properties (ops/specaug.py — beyond-reference
augmentation; the reference's only hook is Gaussian noise,
run_rnnt.py:241-242)."""

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.ops.specaug import spec_augment


def _mel(B=3, T=20, bins=8, stack=3, seed=0):
    rng = np.random.default_rng(seed)
    # strictly nonzero so "masked" is detectable as exact zeros
    return jnp.asarray(rng.uniform(0.5, 1.5, (B, T, bins * stack)),
                       jnp.float32)


def test_freq_mask_consistent_across_stack():
    mel = _mel()
    out = np.asarray(spec_augment(
        jax.random.PRNGKey(3), mel, jnp.full((3,), 20, jnp.int32),
        mel_bins=8, freq_masks=2, freq_width=3, time_masks=0, time_width=0))
    zero = out == 0.0
    # a masked mel bin is masked at every time step and in all 3 stacked
    # copies; unmasked bins are untouched
    for b in range(3):
        per_bin = zero[b].reshape(20, 3, 8).transpose(2, 0, 1)  # [bin, T, S]
        for f in range(8):
            assert per_bin[f].all() or not per_bin[f].any()
    assert zero.any()  # with width 3 x 2 masks over 8 bins, P(no mask) ~ 0


def test_time_mask_respects_real_length():
    mel = _mel(B=2, T=30)
    lens = jnp.asarray([10, 30], jnp.int32)
    out = np.asarray(spec_augment(
        jax.random.PRNGKey(5), mel, lens,
        mel_bins=8, freq_masks=0, freq_width=0, time_masks=2, time_width=8))
    zero_t = (out == 0.0).all(axis=2)  # [B, T] fully-masked frames
    assert not zero_t[0, 10:].any()    # padding of the short one untouched
    assert zero_t.any()
    # masked frames are fully zero, others fully intact
    part = (out == 0.0).any(axis=2) & ~zero_t
    assert not part.any()


def test_disabled_is_identity_and_train_step_runs():
    mel = _mel()
    out = spec_augment(jax.random.PRNGKey(0), mel,
                       jnp.full((3,), 20, jnp.int32), mel_bins=8,
                       freq_masks=0, freq_width=15, time_masks=0,
                       time_width=20)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mel))

    # end-to-end: a train step with specaug on compiles and yields finite loss
    from rnnt_tpu.train.state import create_train_state
    from rnnt_tpu.train.steps import make_train_step

    cfg = tiny_config(specaug_freq_masks=1, specaug_freq_width=2,
                      specaug_time_masks=1, specaug_time_width=2,
                      learning_rate=0.01, grad_clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    B, T, U = 2, 10, 3
    k = jax.random.PRNGKey(1)
    labels = jax.random.randint(k, (B, U), 1, cfg.vocab_size).astype(jnp.int32)
    batch = {
        "mel_specs": jax.random.normal(k, (B, T, cfg.input_feat_size)),
        "pred_inp": jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), labels], axis=1),
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    state2, m = make_train_step(cfg, donate=False)(
        state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
