#!/bin/bash
# Held-out quality evals for the 99h-corpus curriculum run (round 5).
# Runs greedy / beam / int8 / streamed measurements against the final
# /root/scale/run checkpoint through the CLIs, tee'd to evidence.
set -ux
cd /root/repo
DATA=${DATA:-/root/endurance/data}
RUN=${RUN:-/root/scale/run}
LOG=${LOG:-campaign/evidence/scale_evals.log}
COMMON=(--data_dir "$DATA" --output_dir "$RUN" --checkpoint "$RUN"
        --batch_size 32 --pad_frames 192 --pad_tokens 64)

{
  echo "=== greedy (test split) ==="
  PYTHONPATH=/root/repo:/root/.axon_site python -u -m rnnt_tpu.cli.run_rnnt \
    --mode test "${COMMON[@]}"
  echo "=== beam-4 Pallas (test split) ==="
  PYTHONPATH=/root/repo:/root/.axon_site python -u -m rnnt_tpu.cli.run_rnnt \
    --mode test "${COMMON[@]}" --decode beam
  echo "=== beam-4 Pallas again in a fresh process (compile-tax check) ==="
  PYTHONPATH=/root/repo:/root/.axon_site JAX_LOGGING_LEVEL=DEBUG \
    python -u -m rnnt_tpu.cli.run_rnnt --mode test "${COMMON[@]}" \
    --decode beam 2>&1 | grep -iaE "cache|wall-clock|eval_" | tail -40
  echo "=== streamed vs offline (held-out utterances) ==="
  PYTHONPATH=/root/repo:/root/.axon_site python -u -m \
    rnnt_tpu.cli.bench_streaming --checkpoint "$RUN" \
    --audio_dir /root/endurance/corpus --split test-synth --max_utts 64
} 2>&1 | tee -a "$LOG"
