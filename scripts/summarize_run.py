"""Summarize a training run's metrics.jsonl: loss curve, grad norms, evals.

Produces the BASELINE.md-ready evidence tables for a campaign run
(train-loss trajectory, grad-norm trace, periodic-eval metrics, step-time
stats) from the observability stream run_rnnt always writes.

    python scripts/summarize_run.py --run_dir /tmp/campaign/run3 [--every 1000]
"""

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--every", type=int, default=1000,
                   help="sample the train-loss curve every N steps")
    args = p.parse_args(argv)

    path = os.path.join(args.run_dir, "tb", "metrics.jsonl")
    recs = [json.loads(l) for l in open(path)]
    train = [(r["step"], r["train_loss"], r.get("grad_norm"),
              r.get("step_seconds"))
             for r in recs if "train_loss" in r]
    evals = [(r["step"], r) for r in recs if "eval_loss" in r]

    print("| step | train loss | grad norm | s/step |")
    print("|---|---|---|---|")
    shown = set()
    for s, l, g, t in train:
        bucket = s // args.every
        if bucket in shown and s != train[-1][0]:
            continue
        shown.add(bucket)
        print(f"| {s} | {l:.3f} | {g:.1f} | {t:.3f} |")

    print()
    print("| step | eval loss | accuracy | WER | CER |")
    print("|---|---|---|---|---|")
    for s, r in evals:
        print(f"| {s} | {r['eval_loss']:.3f} | "
              f"{r.get('eval_accuracy', float('nan')):.4f} | "
              f"{r.get('eval_wer', float('nan')):.4f} | "
              f"{r.get('eval_cer', float('nan')):.4f} |")

    gs = [g for _, _, g, _ in train if g is not None]
    ls = [l for _, l, _, _ in train]
    import numpy as np

    print()
    print(f"steps logged: {len(train)}; train loss min/last: "
          f"{min(ls):.3f}/{ls[-1]:.3f}; grad norm p50/p95/max: "
          f"{np.percentile(gs, 50):.1f}/{np.percentile(gs, 95):.1f}/"
          f"{max(gs):.1f}; non-finite losses: "
          f"{sum(0 if np.isfinite(l) else 1 for l in ls)}")


if __name__ == "__main__":
    main()
