"""Export a trained model as serialized StableHLO serving artifacts.

The working replacement for the reference's broken TFLite export CLI
(quantize_model.py; SURVEY.md §2.5 quirk 1) — see rnnt_tpu/export.py.

  python -m rnnt_tpu.cli.export_model --checkpoint runs/ls100 \
      --output runs/ls100/export --chunk_frames 4 --platforms tpu cpu

Writes streaming_step.stablehlo + transcribe.stablehlo (with .json metadata
sidecars) into --output.  --check round-trips each artifact through
jax.export.deserialize and compares against the live model.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", default=None,
                   help="output dir (default: <checkpoint>/export)")
    p.add_argument("--chunk_frames", type=int, default=4,
                   help="stacked frames per streaming step")
    p.add_argument("--max_tokens_per_chunk", type=int, default=64)
    p.add_argument("--batch", type=int, default=1,
                   help="transcribe artifact batch size")
    p.add_argument("--frames", type=int, default=512,
                   help="transcribe artifact max frames")
    p.add_argument("--max_output_length", type=int, default=200)
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--no-freeze", dest="freeze", action="store_false",
                   help="keep params as a runtime argument instead of "
                        "embedding them as constants")
    p.add_argument("--check", action="store_true",
                   help="round-trip each artifact and compare to live model")
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rnnt_tpu import export as ex
    from rnnt_tpu.models.transducer import Transducer
    from rnnt_tpu.train import checkpoint as ckpt_mod

    cfg = ckpt_mod.load_config(args.checkpoint)
    state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), state.params)
    out_dir = args.output or os.path.join(args.checkpoint, "export")

    blob, meta = ex.export_streaming_step(
        params, cfg, chunk_frames=args.chunk_frames,
        max_tokens_per_chunk=args.max_tokens_per_chunk,
        platforms=args.platforms, freeze_params=args.freeze)
    path_s = ex.save_artifact(out_dir, "streaming_step", blob, meta)
    print(f"wrote {path_s} ({len(blob) / 2**20:.1f} MB, "
          f"platforms={args.platforms})")

    blob, meta = ex.export_transcribe(
        params, cfg, batch=args.batch, frames=args.frames,
        max_output_length=args.max_output_length,
        platforms=args.platforms, freeze_params=args.freeze)
    path_t = ex.save_artifact(out_dir, "transcribe", blob, meta)
    print(f"wrote {path_t} ({len(blob) / 2**20:.1f} MB)")

    if args.check:
        from rnnt_tpu.decode.greedy import greedy_decode

        model = Transducer(cfg)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((args.batch, args.frames,
                                 cfg.input_feat_size)), jnp.float32)
        lens = jnp.full((args.batch,), args.frames, jnp.int32)
        exp = ex.load_artifact(path_t)
        got = exp.call(mel, lens) if args.freeze else exp.call(
            params, mel, lens)
        ref = greedy_decode(model, params, mel, lens,
                            max_output_length=args.max_output_length)
        ok = all(bool(jnp.array_equal(g, r)) for g, r in zip(got, ref))
        print(f"transcribe round-trip parity: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
