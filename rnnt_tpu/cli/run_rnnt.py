"""Main trainer CLI (ref: run_rnnt.py — flags :26-64, main :444-577).

  python -m rnnt_tpu.cli.run_rnnt --mode train \
      --data_dir data/ls --output_dir runs/ls100 [--checkpoint runs/ls100]

Modes: train | eval | test (run_rnnt.py:26-28,548-576).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="train", choices=["train", "eval", "test"])
    p.add_argument("--data_dir", required=True,
                   help="directory of preprocessed .rnr shards + tokenizer")
    p.add_argument("--output_dir", default="./model",
                   help="checkpoints + logs (run_rnnt.py:38-40)")
    p.add_argument("--checkpoint", default=None,
                   help="resume/eval from this checkpoint dir "
                        "(run_rnnt.py:41-43); 'auto' resumes from the latest "
                        "checkpoint in --output_dir if one exists (restart-"
                        "after-preemption without changing the command line)")
    p.add_argument("--init_from", default=None, metavar="CKPT_DIR",
                   help="warm-start: model weights from this checkpoint, "
                        "FRESH optimizer/step under the current schedule "
                        "(curriculum over corpus size). Ignored when a "
                        "resume checkpoint applies — so '--checkpoint auto "
                        "--init_from small_run/' warm-starts on first "
                        "launch and resumes in place after a preemption")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_epochs", type=int, default=1000)
    p.add_argument("--steps_per_log", type=int, default=10)
    p.add_argument("--steps_per_checkpoint", type=int, default=1000)
    p.add_argument("--eval_size", type=int, default=50,
                   help="max eval batches per periodic eval (run_rnnt.py:55-57)")
    p.add_argument("--reader_threads", type=int, default=1,
                   help="parallel shard-reader threads for the training "
                        "input pipeline (hosts feeding many chips)")
    p.add_argument("--shuffle_buffer", type=int, default=4096,
                   help="streaming shuffle buffer for training (0 = off; "
                        "reseeded per epoch)")
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bfloat16 params/activations (the fp16_run equivalent)")
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--transfer_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dtype for the mel_specs host->device transfer.  "
                        "bfloat16 halves per-step input bytes with no "
                        "numeric cost when training in bf16 (the model "
                        "casts inputs to the compute dtype anyway); also "
                        "halves the per-transfer host-memory growth of the "
                        "remote-attached-chip client (PERFORMANCE.md)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model-axis size of the device mesh")
    p.add_argument("--loss_impl", default="fused",
                   choices=["fused", "banded", "auto", "ref", "pallas"],
                   help="fused = joint+loss Pallas kernel (exact, memory-"
                        "capped); banded = pruned label window around the "
                        "alignment diagonal (~1.5x faster, lower-bound "
                        "objective, width = config loss_band) — quality-"
                        "parity at 124M params (BASELINE banded A/B) and "
                        "the recommended training default when the band "
                        "covers the alignment spread; ref/pallas "
                        "materialize the lattice")
    p.add_argument("--decode", default="greedy", choices=["greedy", "beam"],
                   help="eval-time decoder (beam: BASELINE config #3)")
    p.add_argument("--quantized", default=None, metavar="MODEL_INT8_NPZ",
                   help="eval with int8-quantized weights (cli.quantize_model "
                        "output) — measures the WER delta vs fp (BASELINE "
                        "int8 metric)")
    p.add_argument("--int8_exec", action="store_true",
                   help="with --quantized: EXECUTE pred-net+joint matmuls in "
                        "int8 (int8xint8->int32 MXU, dynamic activation "
                        "quantization; ops/int8_exec.py) instead of "
                        "dequantizing to bf16 — greedy decode only")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of a few train steps "
                        "here (the tracing capability the reference lacked, "
                        "SURVEY.md §5)")
    p.add_argument("--ckpt_backend", default="auto",
                   choices=["auto", "npz", "orbax"],
                   help="auto = orbax when multi-process (collective, "
                        "sharded-array-safe), npz otherwise")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "SPMD (each host reads a disjoint shard subset)")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 for jax.distributed "
                        "(omit to auto-detect on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--pad_frames", type=int, default=0,
                   help="pad every batch to this many mel frames (one "
                        "static shape instead of (T,U) buckets).  REQUIRED "
                        "for multi-host training: hosts execute one global "
                        "SPMD program per step, so per-host bucket choices "
                        "would disagree on the compiled shape and deadlock "
                        "the collective")
    p.add_argument("--pad_tokens", type=int, default=0,
                   help="pad every batch to this many label tokens "
                        "(see --pad_frames)")
    # model/config overrides
    p.add_argument("--config_override", nargs="*", default=[],
                   metavar="KEY=VALUE")
    args = p.parse_args(argv)
    if args.reader_threads > 1 and args.shuffle_buffer <= 1:
        p.error("--reader_threads > 1 requires --shuffle_buffer > 1 "
                "(parallel reads interleave nondeterministically)")
    return args


def _load_config(args):
    from rnnt_tpu.config import RNNTConfig

    # config travels with checkpoint > data_dir > defaults (run_rnnt.py:137-167).
    # A step dir (checkpoint_NNNNNNNN/) holds only state.npz — its run dir
    # owns the sidecar, so a pinned-step eval finds the training config too.
    ckpt_parent = (os.path.dirname(os.path.abspath(args.checkpoint))
                   if args.checkpoint else None)
    for src in [args.checkpoint, ckpt_parent, args.data_dir]:
        if src and os.path.exists(os.path.join(src, "config.json")):
            cfg = RNNTConfig.load(src)
            break
    else:
        cfg = RNNTConfig()
    overrides = {}
    for kv in args.config_override:
        k, _, v = kv.partition("=")
        field_type = type(getattr(cfg, k))
        overrides[k] = field_type(v) if field_type is not bool else v == "True"
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def main(argv=None):
    args = parse_args(argv)

    if args.multihost:
        if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
            # Multi-process CPU (Gloo) collectives: the concurrency-optimized
            # HLO scheduler lets the thunk executor run a program's
            # independent collectives on different threads in a rank-varying
            # order, which nondeterministically deadlocks the Gloo
            # rendezvous (reproduced at ~50% per run by
            # scripts/repro_mh_tp.py: both ranks SIGABRT inside the second
            # periodic eval's eval_step with its collectives never
            # retiring).  The sequential scheduler totally orders the
            # thunks identically on every rank — 6/6 repro attempts green
            # with it, and 0 perf cost in production: TPU never takes this
            # branch.  Must be set before backend initialization.
            flag = "--xla_cpu_enable_concurrency_optimized_scheduler=false"
            if flag not in os.environ.get("XLA_FLAGS", ""):
                os.environ["XLA_FLAGS"] = (
                    os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
        import jax

        kw = {}
        if args.coordinator_address:
            kw = dict(coordinator_address=args.coordinator_address,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        jax.distributed.initialize(**kw)

    import jax
    import jax.numpy as jnp

    from rnnt_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from rnnt_tpu.data import pipeline
    from rnnt_tpu.data.tokenizer import SUBWORD_FILENAME, get_tokenizer
    from rnnt_tpu.parallel.mesh import (batch_sharding, data_read_group,
                                        make_mesh, replicated_sharding,
                                        shard_params)
    from rnnt_tpu.train import checkpoint as ckpt_mod
    from rnnt_tpu.train.loop import run_evaluate, run_training
    from rnnt_tpu.train.state import create_train_state

    if args.checkpoint == "auto":
        # resume-in-place: same command line before and after a preemption
        has_ckpt = (ckpt_mod.list_checkpoint_steps(args.output_dir)
                    or ckpt_mod._orbax_steps(args.output_dir))
        args.checkpoint = args.output_dir if has_ckpt else None

    cfg = _load_config(args)
    os.makedirs(args.output_dir, exist_ok=True)

    # tokenizer travels with checkpoint/data dir (run_rnnt.py:456-467);
    # pinned-step checkpoint dirs defer to their run dir, like the config
    tok_src = args.data_dir
    if args.checkpoint:
        for cand in [args.checkpoint,
                     os.path.dirname(os.path.abspath(args.checkpoint))]:
            if os.path.exists(os.path.join(cand, SUBWORD_FILENAME)):
                tok_src = cand
                break
    tokenizer = get_tokenizer(tok_src, cfg.token_type, cfg.vocab_size)
    if (cfg.token_type == "word-piece" and jax.process_index() == 0
            and args.mode == "train"):
        src = os.path.join(tok_src, SUBWORD_FILENAME)
        dst = os.path.join(args.output_dir, SUBWORD_FILENAME)
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.copy(src, dst)
    cfg = cfg.replace(vocab_size=tokenizer.vocab_size)
    # sidecars are TRAINING provenance: an eval/test run pointed at a run dir
    # must never rewrite them (an eval invoked without the run's
    # --config_override would silently replace the recorded recipe with
    # defaults, breaking every later pinned-step restore)
    if jax.process_index() == 0 and args.mode == "train":
        cfg.save(args.output_dir)

    if args.model_parallel > 1 and cfg.lstm_impl == "auto":
        # GSPMD can shard the scan's gate matmuls over the 'model' axis; the
        # opaque Pallas sequence kernel would force an all-gather of the
        # column/row-sharded LSTM weights (see config.lstm_impl).  Applied
        # AFTER cfg.save: a runtime choice for this mesh, not a property of
        # the checkpoint (a later single-chip resume wants the fast path).
        print("model_parallel > 1: using scan LSTM (GSPMD-shardable); "
              "set lstm_impl=pallas to override")
        cfg = cfg.replace(lstm_impl="scan")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    # state: fresh, restored, or warm-started (run_rnnt.py:477-478)
    if args.checkpoint:
        state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg, dtype)
    elif args.init_from:
        print(f"warm-start: weights from {args.init_from}, fresh "
              "optimizer/step (curriculum init)")
        state = ckpt_mod.init_from_checkpoint(args.init_from, cfg, dtype)
    else:
        state = create_train_state(jax.random.PRNGKey(0), cfg, dtype)

    if args.quantized:
        from rnnt_tpu.ops.quantize import (dequantize_params, int8_exec_params,
                                           load_quantized)

        q = load_quantized(args.quantized, state.params)
        if args.int8_exec:
            if args.mode == "train":
                sys.exit("--int8_exec is an inference path: use --mode "
                         "eval/test (beam decode routes through the XLA "
                         "beam's int8-aware pred/joint steps)")
            state = state._replace(
                params=int8_exec_params(q, dtype, template=state.params))
        else:
            # template: dtype-identical to the fp checkpoint tree, so the
            # jitted eval/decode programs reuse its compile-cache entries
            state = state._replace(
                params=dequantize_params(q, dtype, template=state.params))

    # device mesh; single chip degrades to a 1x1 mesh (run_rnnt.py:123-127)
    mesh = make_mesh(data=-1, model=args.model_parallel)
    n_data = mesh.shape["data"]
    if args.mode == "train" and args.batch_size % n_data:
        # train batches are sharded over the data axis; eval batches stay
        # host-local (per-host metric statistics, aggregated at the end)
        sys.exit(f"--batch_size {args.batch_size} must be divisible by the "
                 f"data-axis size {n_data} of the {dict(mesh.shape)} mesh "
                 f"(each device takes an equal batch shard)")
    # Whole-state placement: params by the TP rules, optimizer momentum the
    # same way (its trace subtree mirrors the param paths, so the same rules
    # apply and momentum memory scales with TP), step replicated.  A restored
    # state's leaves are committed to local devices and would otherwise clash
    # with the global mesh context.
    from rnnt_tpu.parallel.mesh import replicated_sharding

    state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=shard_params(mesh, state.opt_state),
        step=jax.device_put(np.asarray(state.step), replicated_sharding(mesh)))
    bsh = batch_sharding(mesh)

    tdt = jnp.bfloat16 if args.transfer_dtype == "bfloat16" else None

    def _host_cast(k, v):
        # mel features are the only multi-MB input; ship them in bf16 when
        # asked (model casts to compute dtype on device regardless)
        if tdt is not None and k == "mel_specs":
            return np.asarray(v).astype(tdt)
        return np.asarray(v)

    def shard_batch(batch):
        if jax.process_count() > 1:
            # each host holds a disjoint LOCAL batch shard; assemble the
            # global batch-sharded array from per-process data
            return {
                k: jax.make_array_from_process_local_data(bsh, _host_cast(k, v))
                for k, v in batch.items()
            }
        return {k: jax.device_put(_host_cast(k, v), bsh)
                for k, v in batch.items()}

    if (jax.process_count() > 1
            and not (args.pad_frames and args.pad_tokens)):
        sys.exit("multi-host runs require --pad_frames/--pad_tokens: every "
                 "host must submit the same program shape each step "
                 "(bucketed per-host padding would deadlock the SPMD "
                 "collectives)")
    bucket_kw = {}
    if args.pad_frames and args.pad_tokens:
        bucket_kw = dict(t_buckets=[args.pad_frames],
                         u_buckets=[args.pad_tokens])

    # Multi-host lockstep: hosts own different shard subsets, so their
    # per-epoch batch counts differ — if one host exhausts its stream while
    # the others submit another SPMD step, the collective deadlocks.  The
    # count uses a metadata-only shard scan (payloads skipped with seeks)
    # and counts exactly the examples the bucketer will keep: anything over
    # the --pad_frames/--pad_tokens bounds is dropped by bucket_batches, so
    # counting raw records would over-estimate and still deadlock.
    # Disjoint reads are keyed by DATA-ROW group, not raw process index:
    # processes replicating the same data rows (model axis spanning hosts)
    # must read identical streams (parallel/mesh.data_read_group).
    read_group, read_groups = data_read_group(mesh)

    def _local_batches(split):
        from rnnt_tpu.data import records as records_mod

        kept = sum(
            1 for d in records_mod.scan_lengths(
                os.path.join(args.data_dir, f"{split}-*.rnr"),
                process_index=read_group,
                process_count=read_groups)
            if d.get("spec_lengths", 0) <= args.pad_frames
            and d.get("label_lengths", 0) <= args.pad_tokens)
        return -(-kept // args.batch_size)  # ceil: flush_partial

    # Train: agree on min-over-hosts batches/epoch; every epoch truncates to
    # it (the shuffle reseeds per epoch, so different surplus examples are
    # dropped each time).
    steps_per_epoch = 0
    if jax.process_count() > 1 and args.mode == "train":
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray(_local_batches("train"), np.int64))
        steps_per_epoch = int(np.min(counts))
        if jax.process_index() == 0:
            print(f"multi-host lockstep: {steps_per_epoch} steps/epoch "
                  f"(per-host batch counts {np.asarray(counts).tolist()})")

    def batches(split, shuffle=False):
        def gen(epoch=0):
            stream = pipeline.batches_from_shards(
                os.path.join(args.data_dir, f"{split}-*.rnr"), args.batch_size,
                process_index=read_group,
                process_count=read_groups,
                shuffle_buffer=args.shuffle_buffer if shuffle else 0,
                # seed by GROUP so same-group processes shuffle identically
                seed=epoch * 9973 + read_group,
                reader_threads=args.reader_threads if shuffle else 1,
                **bucket_kw)
            # background the host-side batch assembly so it overlaps device
            # steps (the .prefetch() of run_rnnt.py:84)
            out = pipeline.prefetch(stream, depth=2)
            if steps_per_epoch and split == "train":
                import itertools

                out = itertools.islice(out, steps_per_epoch)
            yield from out
        return gen

    def lockstep_eval_batches(split):
        """Collective-aligned eval stream for multi-host: per-host batch
        counts differ, and when the jitted eval/decode programs contain
        cross-host collectives (e.g. a model axis spanning processes) a
        host running out of batches early deadlocks the rest.  Hosts agree
        once on the MAX count and short hosts submit dummy batches
        (num_real=0 — no metric contribution) so every collective stays
        aligned; the static --pad_frames/--pad_tokens shapes (required
        under multi-host) keep the programs identical."""
        from jax.experimental import multihost_utils

        mine = _local_batches(split)
        counts = multihost_utils.process_allgather(
            np.asarray(mine, np.int64))
        target = int(np.max(counts))

        def dummy_batch():
            B, T, U = args.batch_size, args.pad_frames, args.pad_tokens
            return {
                "mel_specs": np.zeros(
                    (B, T, cfg.input_feat_size), np.float32),
                "pred_inp": np.zeros((B, U + 1), np.int32),
                "labels": np.zeros((B, U), np.int32),
                "spec_lengths": np.ones((B,), np.int32),
                "label_lengths": np.zeros((B,), np.int32),
                "loss_weight": np.zeros((B,), np.float32),
                "num_real": np.int32(0),
            }

        def gen(epoch=0):
            n = 0
            for b in batches(split)():
                n += 1
                yield b
            for _ in range(target - n):
                yield dummy_batch()
        return gen

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    multihost = jax.process_count() > 1
    # Model axis spanning processes (read_groups < processes): eval/decode
    # programs contain cross-host collectives, so eval batches must be
    # assembled into global arrays too (host-local numpy can't feed them).
    tp_spans_processes = multihost and read_groups < jax.process_count()
    # Down-weight duplicated eval stats when several processes share a read
    # group (they compute identical stats over the same rows); 1.0 in pure
    # DP where group == process (parallel/mesh.read_group_process_count).
    eval_weight = 1.0
    if tp_spans_processes:
        from rnnt_tpu.parallel.mesh import read_group_process_count

        eval_weight = 1.0 / read_group_process_count(mesh)
    with jax.sharding.set_mesh(mesh):
        if args.mode == "train":
            run_training(
                cfg, state, batches("train", shuffle=True),
                output_dir=args.output_dir,
                eval_batches_fn=(lockstep_eval_batches("dev") if multihost
                                 else batches("dev")),
                tokenizer=tokenizer,
                n_epochs=args.n_epochs,
                steps_per_log=args.steps_per_log,
                steps_per_checkpoint=args.steps_per_checkpoint,
                eval_max_batches=args.eval_size,
                shard_batch=shard_batch,
                loss_impl=args.loss_impl,
                ckpt_backend=args.ckpt_backend,
                eval_multihost=multihost,
                eval_shard_batch=shard_batch if tp_spans_processes else None,
                eval_shard_row_group=read_group if tp_spans_processes else 0,
                eval_stats_weight=eval_weight,
            )
        else:
            if not args.checkpoint:
                print("eval/test requires --checkpoint (run_rnnt.py:550-551)")
                sys.exit(1)
            split = "dev" if args.mode == "eval" else "test"
            eval_stream = (lockstep_eval_batches(split)() if multihost
                           else batches(split)())
            # loss_impl forwarded: eval at parity scale must not fall back to
            # a lattice-materializing loss (~26 GB logits at B=32/T'=384/
            # U+1=129/V=4096).  Metrics are aggregated across processes inside
            # run_evaluate; every process participates, process 0 reports.
            import time

            t0 = time.time()
            metrics = run_evaluate(
                cfg, state, eval_stream, tokenizer=tokenizer,
                decode=args.decode,
                # int8 {"q","s"} params need the qdot-aware XLA beam (the
                # Pallas beam kernel reads fp weights)
                decode_impl=("xla" if (args.quantized and args.int8_exec)
                             else "auto"),
                loss_impl=args.loss_impl,
                # int8-exec {"q","s"} joint leaves can't feed the loss
                # kernels; WER/CER are the int8 measurement anyway
                loss_metrics=not (args.quantized and args.int8_exec),
                shard_batch=shard_batch if tp_spans_processes else None,
                shard_row_group=read_group if tp_spans_processes else 0,
                stats_weight=eval_weight)
            wall = time.time() - t0
            if jax.process_index() == 0:
                print(" ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
                print(f"eval wall-clock: {wall:.1f}s "
                      f"(incl. compile-cache load on first run)")

    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"profile trace written to {args.profile_dir}")


if __name__ == "__main__":
    main()
