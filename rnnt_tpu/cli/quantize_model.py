"""Quantize a trained checkpoint for compact inference (ref: quantize_model.py
— whose TFLite export was broken; this one works, SURVEY.md §2.5 quirk 1).

  python -m rnnt_tpu.cli.quantize_model --checkpoint runs/ls100 \
      -o runs/ls100/model_int8.npz
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-o", "--output", default=None,
                   help="output .npz (default: <checkpoint>/model_int8.npz)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from rnnt_tpu.models.transducer import param_count
    from rnnt_tpu.ops.quantize import (
        quantize_params, quantized_size_bytes, save_quantized)
    from rnnt_tpu.train import checkpoint as ckpt_mod

    cfg = ckpt_mod.load_config(args.checkpoint)
    state = ckpt_mod.restore_checkpoint(args.checkpoint, cfg)

    fp_bytes = sum(np.asarray(x).nbytes
                   for x in jax.tree_util.tree_leaves(state.params))
    q = quantize_params(state.params)
    out = args.output or os.path.join(args.checkpoint, "model_int8.npz")
    save_quantized(out, q)
    q_bytes = quantized_size_bytes(q)
    print(f"params: {param_count(state.params) / 1e6:.1f}M  "
          f"fp: {fp_bytes / 1e6:.1f} MB -> int8: {q_bytes / 1e6:.1f} MB "
          f"({fp_bytes / q_bytes:.2f}x smaller)  wrote {out}")


if __name__ == "__main__":
    main()
