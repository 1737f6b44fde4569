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


def test_async_saver_snapshot_isolation(tmp_path):
    """AsyncSaver must checkpoint the state AS OF save() time even when the
    caller's buffers are donated/overwritten immediately after (the exact
    hazard of overlapping saves with donated train steps)."""
    out_dir = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    saver = ckpt_mod.AsyncSaver()
    saver.save(out_dir, state, CFG)

    # clobber the live tree right away (donation stand-in: same buffers
    # would be re-used); the background writer must be reading a snapshot
    donate = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x * 0 - 1, t),
                     donate_argnums=0)
    _ = jax.block_until_ready(donate(state.params))
    path = saver.wait()
    assert path and os.path.exists(os.path.join(path, "state.npz"))

    restored = ckpt_mod.restore_checkpoint(out_dir, CFG)
    ref = create_train_state(jax.random.PRNGKey(0), CFG)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(ref.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=1e-6)

    # a second save on the same saver works after the first landed
    saver.save(out_dir, restored._replace(
        step=jnp.asarray(7, jnp.int32)), CFG)
    assert saver.wait().endswith("checkpoint_00000007")


def test_sigterm_checkpoints_and_exits(tmp_path):
    """Preemption safety: SIGTERM mid-epoch → checkpoint at the next step
    boundary, clean return (the recovery story the reference lacked)."""
    import signal

    out_dir = str(tmp_path / "run")
    batches = _batches(n=6)

    def gen():
        for i, b in enumerate(batches):
            if i == 2:  # preemption arrives while step 2 is in flight
                signal.raise_signal(signal.SIGTERM)
            yield b

    state = create_train_state(jax.random.PRNGKey(0), CFG)
    state = run_training(
        CFG, state, lambda: gen(),
        output_dir=out_dir,
        n_epochs=1,
        steps_per_log=100,
        steps_per_checkpoint=100,  # never reached normally
        loss_impl="ref",
    )
    stopped_at = int(np.asarray(state.step))
    assert stopped_at < 6  # exited early
    steps = ckpt_mod.list_checkpoint_steps(out_dir)
    assert steps and steps[-1] == stopped_at  # preemption checkpoint written
    # handler restored: SIGTERM no longer intercepted by the loop
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or callable(
        signal.getsignal(signal.SIGTERM))
    # and no tmp file left behind by the atomic publish
    ckpt_path = os.path.join(out_dir, f"checkpoint_{stopped_at:08d}")
    assert not os.path.exists(os.path.join(ckpt_path, ".state.npz.tmp"))
    restored = ckpt_mod.restore_checkpoint(out_dir, CFG)
    assert int(np.asarray(restored.step)) == stopped_at


def test_async_saver_orbax_backend(tmp_path):
    """Orbax saves through AsyncSaver: save() returns with the write in
    flight (d2h copy done — donation-safe), wait() lands the commit, the
    next save prunes beyond keep, restore round-trips.  This is the
    single-process contract for the collective pod-slice path (the
    2-process integration lives in test_multihost.py)."""
    out = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    saver = ckpt_mod.AsyncSaver()
    p0 = saver.save(out, state, CFG, backend="orbax", keep=2)
    # orbax copies to host BEFORE returning: clobbering the live buffers
    # now must not corrupt the in-flight write (donation stand-in)
    donate = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x * 0 - 1, t),
                     donate_argnums=0)
    _ = jax.block_until_ready(donate(state.params))
    assert saver.wait() == p0
    assert os.path.isdir(p0)

    restored = ckpt_mod.restore_checkpoint(out, CFG)
    ref = create_train_state(jax.random.PRNGKey(0), CFG)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(ref.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=1e-6)

    # more saves on the same saver: pruning only ever drops COMMITTED
    # checkpoints beyond keep — the in-flight save never counts toward the
    # quota (a crash before its commit must still leave `keep` on disk)
    for s in (5, 9):
        saver.save(out, restored._replace(
            step=jnp.asarray(s, jnp.int32)), CFG, backend="orbax", keep=2)
    saver.wait()
    assert ckpt_mod._orbax_steps(out) == [0, 5, 9]  # 9 didn't count at save
    saver.save(out, restored._replace(
        step=jnp.asarray(12, jnp.int32)), CFG, backend="orbax", keep=2)
    saver.wait()
    assert ckpt_mod._orbax_steps(out) == [5, 9, 12]
    assert int(np.asarray(
        ckpt_mod.restore_checkpoint(out, CFG).step)) == 12


def test_init_from_checkpoint_warm_start(tmp_path):
    """--init_from: weights come from the checkpoint, step and optimizer
    state are FRESH under the (possibly different) new schedule — the
    curriculum-over-corpus-size mechanism."""
    out = str(tmp_path / "small_run")
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    trained = state._replace(step=jnp.asarray(1234, jnp.int32))
    ckpt_mod.save_checkpoint(out, trained, CFG)

    # new run: longer cosine horizon — different opt_state layout vs CFG's
    # constant-lr chain, which full restore could NOT absorb
    big_cfg = CFG.replace(lr_schedule="cosine", decay_steps=100,
                          warmup_steps=10)
    warm = ckpt_mod.init_from_checkpoint(out, big_cfg)
    assert int(np.asarray(warm.step)) == 0  # fresh step
    for a, b in zip(jax.tree_util.tree_leaves(warm.params),
                    jax.tree_util.tree_leaves(trained.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=1e-6)
    # opt_state matches a FRESH state under the new schedule, tree-wise
    fresh = create_train_state(jax.random.PRNGKey(1), big_cfg)
    assert (jax.tree_util.tree_structure(warm.opt_state)
            == jax.tree_util.tree_structure(fresh.opt_state))

    # geometry mismatch is a hard error, not silent garbage
    import pytest

    with pytest.raises(AssertionError, match="geometry mismatch"):
        ckpt_mod.init_from_checkpoint(
            out, CFG.replace(joint_size=CFG.joint_size * 2))


def test_corrupt_checkpoint_not_listed(tmp_path):
    """A truncated state.npz (crash mid-write before the atomic rename) is
    never visible; only fully-published checkpoints are discoverable."""
    out = str(tmp_path / "ck")
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ckpt_mod.save_checkpoint(out, state, CFG)
    # simulate a crash mid-write of a NEWER checkpoint: dir exists, tmp only
    newer = os.path.join(out, "checkpoint_00009999")
    os.makedirs(newer)
    with open(os.path.join(newer, ".state.npz.tmp"), "wb") as f:
        f.write(b"truncated")
    assert ckpt_mod.list_checkpoint_steps(out) == [0]
    restored = ckpt_mod.restore_checkpoint(out, CFG)
    assert int(np.asarray(restored.step)) == 0


def test_run_evaluate_metrics(tmp_path):
    batches = _batches(n=2)
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    m = run_evaluate(CFG, state, iter(batches), decode_metrics=True)
    assert np.isfinite(m["eval_loss"])
    assert 0.0 <= m["eval_accuracy"] <= 1.0


def test_hparams_plugin_event(tmp_path):
    """The TB HParams session summary must actually land in the event file —
    observe.hparams reaches through TB Writer internals, so pin it here."""
    from rnnt_tpu.config import tiny_config
    from rnnt_tpu.train.observe import MetricsWriter

    w = MetricsWriter(str(tmp_path), "r")
    w.hparams(tiny_config())
    w.scalars(1, {"train_loss": 1.0})
    w.close()

    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader)
    except Exception:
        import pytest
        pytest.skip("tensorboard not importable")
    import glob as globlib
    import os
    files = globlib.glob(os.path.join(str(tmp_path), "r", "events.*"))
    assert files, "no TB event file written"
    plugins = set()
    for ev in EventFileLoader(files[0]).Load():
        if ev.HasField("summary"):
            for v in ev.summary.value:
                plugins.add(v.metadata.plugin_data.plugin_name)
    assert "hparams" in plugins, plugins
    assert "scalars" in plugins, plugins


def test_enable_compile_cache(tmp_path, monkeypatch):
    import jax

    from rnnt_tpu.compile_cache import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("RNNT_COMPILE_CACHE", str(tmp_path / "xla"))
        jax.config.update("jax_compilation_cache_dir", None)
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
        assert (tmp_path / "xla").is_dir()
        # idempotent: an already-configured dir (user env) wins
        enable_compile_cache(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_run_evaluate_defaults_to_fused_loss(monkeypatch):
    """Standalone eval must take the fused (lattice-free) loss path by
    default — round-1 hazard: run_evaluate without an explicit eval_step fell
    back to loss_impl="auto", materializing [B,T,U+1,V] logits (~26 GB fp32
    at parity geometry, OOM on one chip).  Ref contract: eval runs the same
    kernel training does (run_rnnt.py:380-441)."""
    from rnnt_tpu.ops import joint_loss_fused
    from rnnt_tpu.train import steps as steps_mod

    calls = {"fused": 0}
    real_fused = joint_loss_fused.transducer_loss_fused

    def spy_fused(*a, **k):
        calls["fused"] += 1
        return real_fused(*a, **k)

    def forbid_materialized(*a, **k):
        raise AssertionError(
            "lattice-materializing rnnt_loss reached from the eval path")

    monkeypatch.setattr(joint_loss_fused, "transducer_loss_fused", spy_fused)
    monkeypatch.setattr(steps_mod, "rnnt_loss", forbid_materialized)

    state = create_train_state(jax.random.PRNGKey(0), CFG)
    metrics = run_evaluate(CFG, state, iter(_batches(n=1)),
                           decode_metrics=False)
    assert calls["fused"] >= 1
    assert np.isfinite(metrics["eval_loss"])
