"""Data-parallel scaling efficiency of the train step across a device mesh.

The driver north-star asks for audio-s/s scaling efficiency at 1 chip /
1 host / N hosts (BASELINE.json).  This harness measures the same jitted
train step at a fixed PER-DEVICE batch over growing ('data', model) meshes
and reports throughput + efficiency vs the single-device run.

On real multi-chip hardware it measures true ICI scaling; on a single-chip
or CPU box run with --simulate N (xla_force_host_platform-style virtual
devices) to validate the sharding path — simulated numbers validate
correctness, not performance.

  python -m rnnt_tpu.cli.bench_scaling --devices 1 2 4 8 --per_device_batch 8
  python -m rnnt_tpu.cli.bench_scaling --simulate 8 --tiny
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, nargs="+", default=None,
                   help="mesh sizes to measure (default: 1,2,4,... up to all)")
    p.add_argument("--per_device_batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--labels", type=int, default=64)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--loss_impl", default="fused",
                   choices=["fused", "banded", "auto", "ref", "pallas"])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--simulate", type=int, default=0,
                   help="force N virtual CPU devices (sharding validation)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU-feasible) instead of parity scale")
    args = p.parse_args(argv)

    import os

    if args.simulate:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.simulate:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.simulate)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rnnt_tpu.config import RNNTConfig, tiny_config
    from rnnt_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_sharding_rules)
    from rnnt_tpu.train.state import create_train_state
    from rnnt_tpu.train.steps import make_train_step

    n_avail = jax.device_count()
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    if args.tiny:
        cfg = tiny_config(vocab_size=64, encoder_layers=2, encoder_size=64,
                          projection_size=32, pred_net_size=64, joint_size=32,
                          embedding_size=32, mel_bins=16)
    else:
        cfg = RNNTConfig(compute_dtype="bfloat16")
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    T, U = args.frames, args.labels
    sec_per_frame = cfg.frame_step * cfg.downsample_factor
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    base = None
    results = []
    for n in sizes:
        if n > n_avail or n % args.model_parallel:
            continue
        B = args.per_device_batch * (n // args.model_parallel)
        mesh = make_mesh(data=n // args.model_parallel,
                         model=args.model_parallel,
                         devices=jax.devices()[:n])
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        shardings = param_sharding_rules(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        opt = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            state.opt_state)
        state = state._replace(
            params=params, opt_state=opt,
            step=jax.device_put(state.step, NamedSharding(mesh, P())))
        bsh = batch_sharding(mesh)
        batch = {
            "mel_specs": jax.device_put(jnp.asarray(
                rng.standard_normal((B, T, cfg.input_feat_size)), dtype), bsh),
            "pred_inp": jax.device_put(jnp.asarray(np.concatenate(
                [np.zeros((B, 1)), rng.integers(1, cfg.vocab_size, (B, U))],
                1), jnp.int32), bsh),
            "labels": jax.device_put(jnp.asarray(
                rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32), bsh),
            "spec_lengths": jax.device_put(jnp.full((B,), T, jnp.int32), bsh),
            "label_lengths": jax.device_put(jnp.full((B,), U, jnp.int32), bsh),
        }
        step_fn = make_train_step(cfg, loss_impl=args.loss_impl, donate=True)
        with jax.sharding.set_mesh(mesh):
            state, m = step_fn(state, batch, key)
            loss = float(m["loss"])  # sync
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = step_fn(state, batch, key)
            loss = float(m["loss"])
            dt = (time.perf_counter() - t0) / args.steps
        assert np.isfinite(loss)
        audio_s = B * T * sec_per_frame / dt
        per_dev = audio_s / n
        if base is None:
            base = per_dev
        results.append({
            "devices": n, "mesh": f"{n // args.model_parallel}x{args.model_parallel}",
            "global_batch": B, "step_ms": round(dt * 1e3, 1),
            "audio_s_per_s": round(audio_s, 1),
            "per_device": round(per_dev, 1),
            "efficiency_vs_1dev": round(per_dev / base, 4),
        })
        del state, batch

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
