"""Decode throughput benchmark: greedy and beam search at the parity config.

The reference has no decode benchmark (its only perf tooling is the
warp-transducer loss timing binaries, cmake/warp-rnnt-cmakelist.txt:104-130);
this harness records the inference-side numbers for BASELINE.md.

Usage (on the TPU chip):
    python -m rnnt_tpu.cli.bench_decode [--batch 64] [--frames 128] [--reps 5]

Reports ms/batch and audio-s/s for:
  greedy        decode/greedy.py lax.while_loop
  beam-K xla    decode/beam.py device loop (expansions_per_frame=1)
  beam-K pallas ops/beam_pallas.py single-kernel search
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import RNNTConfig


def _time(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    # axon's block_until_ready does not await remote execution; force a
    # host materialization of one leaf to really fence.
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / reps


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=128,
                   help="encoder-output frames per utterance")
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--max_output_length", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--int8", action="store_true",
                   help="also bench greedy decode with TRUE int8 execution "
                        "of pred-net+joint (ops/int8_exec qdot) vs the "
                        "dequantized-weight path — the BASELINE int8 "
                        "latency/HBM measurement")
    args = p.parse_args(argv)

    from rnnt_tpu.decode.beam import beam_search_encoded
    from rnnt_tpu.decode.greedy import greedy_decode_encoded
    from rnnt_tpu.models.transducer import Transducer, init_transducer_params
    from rnnt_tpu.ops.beam_pallas import beam_search_encoded_pallas

    cfg = RNNTConfig(
        compute_dtype="bfloat16" if args.bf16 else "float32")
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    model = Transducer(cfg)
    params = init_transducer_params(jax.random.PRNGKey(0), cfg, dt)
    params["joint"]["b2"] = params["joint"]["b2"].at[0].add(-2.0)

    B, T, P = args.batch, args.frames, cfg.projection_size
    enc = (jax.random.normal(jax.random.PRNGKey(1), (B, T, P)) * 2).astype(dt)
    lens = jnp.full((B,), T, jnp.int32)
    # audio seconds represented by one batch: each encoder frame covers
    # frame_step * downsample * time_reduction seconds of audio
    sec_per_frame = (cfg.frame_step * cfg.downsample_factor
                     * cfg.time_reduction_factor)
    audio_s = B * T * sec_per_frame

    runs = {
        "greedy": jax.jit(lambda e, l: greedy_decode_encoded(
            model, params, e, l,
            max_output_length=args.max_output_length)),
        f"beam-{args.beam} xla": jax.jit(lambda e, l: beam_search_encoded(
            model, params, e, l, beam_width=args.beam,
            max_output_length=args.max_output_length,
            expansions_per_frame=1, prune_vocab=args.beam)),
        f"beam-{args.beam} pallas E=1": jax.jit(
            lambda e, l: beam_search_encoded_pallas(
                model, params, e, l, beam_width=args.beam,
                max_output_length=args.max_output_length,
                expansions_per_frame=1)),
        f"beam-{args.beam} pallas E=6": jax.jit(
            lambda e, l: beam_search_encoded_pallas(
                model, params, e, l, beam_width=args.beam,
                max_output_length=args.max_output_length,
                expansions_per_frame=6)),
    }
    if args.int8:
        from rnnt_tpu.ops.quantize import (dequantize_params,
                                           int8_exec_params, quantize_params)

        q = quantize_params(params)
        deq = dequantize_params(q, dt, template=params)
        mixed = int8_exec_params(q, dt, template=params)

        def _wbytes(tree):
            import jax as _j

            return sum(x.nbytes for x in _j.tree_util.tree_leaves(tree))

        print(f"int8 exec: pred+joint weights "
              f"{_wbytes(mixed['prediction']) + _wbytes(mixed['joint']):,} B "
              f"vs dequant "
              f"{_wbytes(deq['prediction']) + _wbytes(deq['joint']):,} B")
        runs["greedy int8-exec"] = jax.jit(
            lambda e, l: greedy_decode_encoded(
                model, mixed, e, l,
                max_output_length=args.max_output_length))
        runs["greedy dequant"] = jax.jit(
            lambda e, l: greedy_decode_encoded(
                model, deq, e, l,
                max_output_length=args.max_output_length))
        # int8 beam tradeoff (VERDICT r3 weak #6): the qdot-aware XLA beam
        # on int8 weights vs the Pallas beam on dequantized bf16 weights —
        # serve.py routes int8 beam through the former
        runs[f"beam-{args.beam} xla int8-exec"] = jax.jit(
            lambda e, l: beam_search_encoded(
                model, mixed, e, l, beam_width=args.beam,
                max_output_length=args.max_output_length,
                expansions_per_frame=1, prune_vocab=args.beam))
        runs[f"beam-{args.beam} pallas dequant E=1"] = jax.jit(
            lambda e, l: beam_search_encoded_pallas(
                model, deq, e, l, beam_width=args.beam,
                max_output_length=args.max_output_length,
                expansions_per_frame=1))

    print(f"B={B} T'={T} vocab={cfg.vocab_size} dtype={dt.__name__} "
          f"({audio_s:.0f} audio-s/batch)")
    for name, fn in runs.items():
        dt_s = _time(fn, (enc, lens), args.reps)
        print(f"{name:20s} {dt_s * 1e3:8.2f} ms/batch   "
              f"{audio_s / dt_s:10.0f} audio-s/s")


if __name__ == "__main__":
    main()
