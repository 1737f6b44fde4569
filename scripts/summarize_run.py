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

    # endurance evidence (VERDICT r3 missing #3): step-time stability over
    # the whole run, eval wall-clock trend, and host RSS if a monitor CSV
    # (scripts ../endurance monitor) sits next to the run dir
    ts = [t for _, _, _, t in train if t is not None]
    if ts:
        print(f"step seconds p10/p50/p90/p99/max: "
              f"{np.percentile(ts, 10):.3f}/{np.percentile(ts, 50):.3f}/"
              f"{np.percentile(ts, 90):.3f}/{np.percentile(ts, 99):.3f}/"
              f"{max(ts):.3f}  (spikes above p99 are tunnel/compile "
              f"stalls, not compute)")
    es = [r.get("eval_seconds") for _, r in evals
          if r.get("eval_seconds") is not None]
    if es:
        print(f"eval wall-clock first/median/last: "
              f"{es[0]:.1f}/{float(np.median(es)):.1f}/{es[-1]:.1f} s")
    rss_csv = os.path.join(os.path.dirname(os.path.abspath(args.run_dir)),
                           "rss.csv")
    if os.path.exists(rss_csv):
        rows = [l.strip().split(",") for l in open(rss_csv)
                if l[:2].isdigit()]
        rss = [int(r[1]) / 1e6 for r in rows if int(r[1]) > 0]  # GB
        if rss:
            hours = (int(rows[-1][0]) - int(rows[0][0])) / 3600
            print(f"trainer RSS over {hours:.1f} h: first/median/max "
                  f"{rss[0]:.1f}/{float(np.median(rss)):.1f}/"
                  f"{max(rss):.1f} GB ({len(rss)} samples)")


if __name__ == "__main__":
    main()
