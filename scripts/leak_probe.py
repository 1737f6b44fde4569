"""Host-RSS leak isolation probes (BASELINE.md endurance section).

The 99h endurance run's trainer RSS grew 0.7 -> 78.8 GB over 2.1 h.  These
probes isolate WHERE per-step host memory can grow by exercising each layer
of the training stack separately and sampling the process's anonymous RSS
(`RssAnon` in /proc/self/status — heap/arena growth, excludes file-backed
shard mmaps):

  pipeline    the real shard-reader -> bucketed-batch input pipeline, no JAX
  device_put  host->device transfer + result fetch of mel-sized arrays, on
              whatever backend JAX_PLATFORMS selects (cpu = framework-only
              control; axon = includes the tunnel client under suspicion)
  train       real jitted train steps (tiny geometry) fed fresh batches

Flat CPU-backend curves for all three + a growing axon device_put curve pin
the leak on the tunnel client, outside the framework.  Run:

  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/leak_probe.py --probe all \
      --iters 300 --out campaign/evidence/leak_probe_cpu.jsonl
  python scripts/leak_probe.py --probe device_put --iters 300 \
      --out campaign/evidence/leak_probe_axon.jsonl     # needs the chip

Each sample is one JSON line {probe, iter, rss_anon_kb}; a final summary
line per probe records start/end/net growth.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_anon_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon"):
                return int(line.split()[1])
    return -1


class Recorder:
    def __init__(self, out_path):
        self.f = open(out_path, "a") if out_path else sys.stdout

    def sample(self, probe, i):
        rec = {"probe": probe, "iter": i, "rss_anon_kb": rss_anon_kb()}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        return rec

    def summary(self, probe, first, last, iters):
        rec = {"probe": probe, "summary": True, "iters": iters,
               "rss_start_kb": first, "rss_end_kb": last,
               "net_growth_mb": round((last - first) / 1024.0, 1)}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        print(f"[{probe}] {iters} iters: RssAnon {first/1024:.0f} -> "
              f"{last/1024:.0f} MB (net {(last-first)/1024:.1f} MB)")


def probe_pipeline(rec: Recorder, iters: int, data_dir: str):
    """Shard reader + bucketing + padding, zero JAX involvement."""
    from rnnt_tpu.data import pipeline

    it = None
    first = last = None
    i = 0
    while i < iters:
        if it is None:  # re-open across epochs so the probe never starves
            it = pipeline.batches_from_shards(
                os.path.join(data_dir, "train-*.rnr"), 32,
                shuffle_buffer=1024, seed=i,
                t_buckets=[192], u_buckets=[64])
        try:
            batch = next(it)
        except StopIteration:
            it = None
            continue
        assert batch["mel_specs"].shape[0] == 32
        if i % 10 == 0:
            r = rec.sample("pipeline", i)
            first = first if first is not None else r["rss_anon_kb"]
            last = r["rss_anon_kb"]
        i += 1
    rec.summary("pipeline", first, last, iters)


def probe_device_put(rec: Recorder, iters: int):
    """The endurance step's host->device traffic shape: a [32,192,240] fp32
    mel batch + int32 sides in, a scalar loss out, every iteration."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    fold = jax.jit(lambda m, p: (jnp.asarray(m, jnp.float32).sum()
                                 + p.sum()).astype(jnp.float32))
    first = last = None
    for i in range(iters):
        mel = rng.standard_normal((32, 192, 240)).astype(np.float32)
        pred = rng.integers(0, 64, (32, 65)).astype(np.int32)
        loss = float(fold(jax.device_put(mel), jax.device_put(pred)))
        assert np.isfinite(loss)
        if i % 10 == 0:
            r = rec.sample("device_put", i)
            first = first if first is not None else r["rss_anon_kb"]
            last = r["rss_anon_kb"]
    rec.summary("device_put", first, last, iters)


def probe_train(rec: Recorder, iters: int):
    """Real jitted+donated train steps at tiny geometry, fresh host batches
    each step (the full framework loop minus the tunnel)."""
    import jax

    from rnnt_tpu.config import tiny_config
    from rnnt_tpu.train.state import create_train_state
    from rnnt_tpu.train.steps import make_train_step

    cfg = tiny_config()
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, loss_impl="ref")
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    B, T, U = 4, 24, 6
    first = last = None
    for i in range(iters):
        labels = rng.integers(1, cfg.vocab_size, (B, U)).astype(np.int32)
        batch = {
            "mel_specs": rng.standard_normal(
                (B, T, cfg.input_feat_size)).astype(np.float32),
            "pred_inp": np.concatenate(
                [np.zeros((B, 1), np.int32), labels], 1),
            "labels": labels,
            "spec_lengths": np.full((B,), T, np.int32),
            "label_lengths": np.full((B,), U, np.int32),
        }
        state, metrics = step_fn(state, batch, key)
        assert np.isfinite(float(metrics["loss"]))
        if i % 10 == 0:
            r = rec.sample("train", i)
            first = first if first is not None else r["rss_anon_kb"]
            last = r["rss_anon_kb"]
    rec.summary("train", first, last, iters)


def probe_backend_recycle(rec: Recorder, iters: int):
    """Does tearing down the backend reclaim the tunnel client's leak?

    Runs the device_put transfer loop in phases of iters/3, calling
    jax.clear_backends() between phases.  If the leaked buffers are held
    alive by the client object, RssAnon drops at each recycle and an
    in-process backend recycle (fetch state -> clear -> re-put, piggybacked
    on a checkpoint boundary) is a cheaper bound than the drives' full
    process recycle.  If RSS stays flat across the clear, the memory is
    leaked unreferenced and only a process recycle reclaims it.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    phase_iters = max(1, iters // 3)
    first = last = None
    n = 0
    for phase in range(3):
        fold = jax.jit(lambda m, p: (jnp.asarray(m, jnp.float32).sum()
                                     + p.sum()).astype(jnp.float32))
        for i in range(phase_iters):
            mel = rng.standard_normal((32, 192, 240)).astype(np.float32)
            pred = rng.integers(0, 64, (32, 65)).astype(np.int32)
            loss = float(fold(jax.device_put(mel), jax.device_put(pred)))
            assert np.isfinite(loss)
            if i % 10 == 0:
                r = rec.sample("backend_recycle", n)
                first = first if first is not None else r["rss_anon_kb"]
                last = r["rss_anon_kb"]
            n += 1
        from jax.extend.backend import clear_backends

        before = rss_anon_kb()
        jax.clear_caches()
        clear_backends()
        after = rss_anon_kb()
        rec.f.write(json.dumps(
            {"probe": "backend_recycle", "event": "clear_backends",
             "phase": phase, "rss_before_kb": before, "rss_after_kb": after,
             "reclaimed_mb": round((before - after) / 1024.0, 1)}) + "\n")
        rec.f.flush()
        print(f"[backend_recycle] phase {phase} clear_backends: "
              f"{before/1024:.0f} -> {after/1024:.0f} MB "
              f"(reclaimed {(before-after)/1024:.1f} MB)")
    rec.summary("backend_recycle", first, last, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all",
                    choices=["all", "pipeline", "device_put", "train",
                             "backend_recycle"])
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--data_dir", default="/root/endurance/data",
                    help="shard dir for the pipeline probe (synthetic "
                         "fallback: point at any preprocessed corpus)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rec = Recorder(args.out)
    import jax
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    if args.probe in ("all", "pipeline"):
        if os.path.isdir(args.data_dir):
            probe_pipeline(rec, args.iters, args.data_dir)
        else:
            print(f"[pipeline] skipped: no data_dir at {args.data_dir}")
    if args.probe in ("all", "device_put"):
        probe_device_put(rec, args.iters)
    if args.probe in ("all", "train"):
        probe_train(rec, args.iters)
    if args.probe == "backend_recycle":  # opt-in: tears down the backend
        probe_backend_recycle(rec, args.iters)


if __name__ == "__main__":
    main()
