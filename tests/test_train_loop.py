"""run_training / run_evaluate loop: checkpoints written, metrics logged,
resume continues from the saved step (ref contract: run_rnnt.py:233-441)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.train import checkpoint as ckpt_mod
from rnnt_tpu.train.loop import run_evaluate, run_training
from rnnt_tpu.train.state import create_train_state

CFG = tiny_config(learning_rate=0.02, grad_clip_norm=1.0)


def _batches(n=3, B=4, T=10, U=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        labels = rng.integers(1, CFG.vocab_size, (B, U)).astype(np.int32)
        out.append({
            "mel_specs": rng.standard_normal(
                (B, T, CFG.input_feat_size)).astype(np.float32),
            "pred_inp": np.concatenate(
                [np.zeros((B, 1), np.int32), labels], 1),
            "labels": labels,
            "spec_lengths": np.full((B,), T, np.int32),
            "label_lengths": np.full((B,), U, np.int32),
        })
    return out


def test_run_training_checkpoints_and_logs(tmp_path):
    out_dir = str(tmp_path / "run")
    batches = _batches()
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    state = run_training(
        CFG, state, lambda: iter(batches),
        output_dir=out_dir,
        eval_batches_fn=lambda: iter(batches[:1]),
        n_epochs=2,
        steps_per_log=2,
        steps_per_checkpoint=4,
        loss_impl="ref",
    )
    assert int(np.asarray(state.step)) == 6  # 3 batches x 2 epochs
    steps = ckpt_mod.list_checkpoint_steps(out_dir)
    assert 4 in steps and 6 in steps  # periodic + final (run_rnnt.py:377)
    # metrics JSONL exists with train_loss entries
    metrics_path = os.path.join(out_dir, "tb", "metrics.jsonl")
    recs = [json.loads(l) for l in open(metrics_path)]
    assert any("train_loss" in r for r in recs)
    assert any("eval_loss" in r for r in recs)

    # resume restores the exact step
    restored = ckpt_mod.restore_checkpoint(out_dir, CFG)
    assert int(np.asarray(restored.step)) == 6


def test_run_evaluate_metrics(tmp_path):
    batches = _batches(n=2)
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    m = run_evaluate(CFG, state, iter(batches), decode_metrics=True)
    assert np.isfinite(m["eval_loss"])
    assert 0.0 <= m["eval_accuracy"] <= 1.0
