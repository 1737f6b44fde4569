"""Validate a preprocessed dataset: no NaN/Inf, no empty tensors, sane
lengths.

The working replacement for debug/debug_dataset.py (which had drifted from
the pipeline's element structure — SURVEY.md §2.5 quirk 2; this one reads
the real record shards).

  python -m rnnt_tpu.cli.debug_dataset --data_dir data/ls --split train
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from rnnt_tpu.data import records

REQUIRED = ["mel_specs", "pred_inp", "labels", "spec_lengths", "label_lengths"]


def check_example(i: int, ex) -> list:
    problems = []
    for key in REQUIRED:
        if key not in ex:
            problems.append(f"example {i}: missing field {key}")
            continue
        arr = np.asarray(ex[key])
        if arr.size == 0:
            problems.append(f"example {i}: {key} is empty")
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            problems.append(f"example {i}: {key} has NaN/Inf")
    if not problems:
        t = int(ex["spec_lengths"])
        u = int(ex["label_lengths"])
        if ex["mel_specs"].shape[0] != t:
            problems.append(f"example {i}: spec_lengths {t} != mel rows "
                            f"{ex['mel_specs'].shape[0]}")
        if ex["labels"].shape[0] != u:
            problems.append(f"example {i}: label_lengths {u} != labels "
                            f"{ex['labels'].shape[0]}")
        if ex["pred_inp"].shape[0] != u + 1 or int(ex["pred_inp"][0]) != 0:
            problems.append(f"example {i}: pred_inp must be 0-prefixed labels")
        if (np.asarray(ex["labels"]) == 0).any():
            problems.append(f"example {i}: blank id 0 appears in labels")
    return problems


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--max_problems", type=int, default=20)
    args = p.parse_args(argv)

    pattern = os.path.join(args.data_dir, f"{args.split}-*.rnr")
    n = 0
    problems = []
    for i, ex in enumerate(records.read_shards(pattern)):
        n += 1
        problems.extend(check_example(i, ex))
        if len(problems) >= args.max_problems:
            break
    for msg in problems[: args.max_problems]:
        print("FAIL:", msg)
    if problems:
        sys.exit(1)
    print(f"All checks passed. ({n} examples)")  # debug_dataset.py:80


if __name__ == "__main__":
    main()
