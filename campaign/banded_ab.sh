#!/bin/bash
# Banded-loss quality A/B at parity scale (VERDICT r4 weak: the +49%
# throughput banded kernel's only quality evidence was a toy 3x256 model).
# Two identical 124M-param trainings on the 12k-utterance letters corpus
# (the round-4 hedge corpus + recipe, which converges dev WER ~0.02 by
# step 6k), differing ONLY in --loss_impl: exact fused vs banded
# (loss_band=16).  Held-out test evals close the comparison.
#
# Usage: bash campaign/banded_ab.sh [exact|banded|evals]
set -u
cd /root/repo
DATA=${DATA:-/root/hedge/data}
BASE=${BASE:-/root/ab}
ARM=${1:-exact}

RECIPE=(--batch_size 32 --steps_per_log 50
        --steps_per_checkpoint 2000 --eval_size 2
        --pad_frames 192 --pad_tokens 64 --shuffle_buffer 8192)
# 12k utts / B=32 = 375 steps/epoch; 16 epochs = 6000 steps (the hedge
# convergence horizon)
EPOCHS=(--n_epochs 16)
OV=(optimizer=adam learning_rate=0.0002 warmup_steps=500 lr_schedule=cosine
    decay_steps=20000 lr_final_factor=0.05 grad_clip_norm=0.5
    init_blank_bias=-4.0 input_noise_stddev=0.075 specaug_freq_masks=2
    specaug_freq_width=15 specaug_time_masks=2 specaug_time_width=20)

mkdir -p "$BASE"
case "$ARM" in
  exact)
    DATA=$DATA WAIT_S=420 TRIES=8 bash campaign/launch.sh \
      "$BASE/exact.log" "$BASE/exact" "${RECIPE[@]}" "${EPOCHS[@]}" \
      --loss_impl fused --config_override "${OV[@]}"
    ;;
  banded)
    DATA=$DATA WAIT_S=420 TRIES=8 bash campaign/launch.sh \
      "$BASE/banded.log" "$BASE/banded" "${RECIPE[@]}" "${EPOCHS[@]}" \
      --loss_impl banded --config_override "${OV[@]}" loss_band=16
    ;;
  evals)
    for arm in exact banded; do
      echo "=== $arm test eval (greedy) ==="
      PYTHONPATH=/root/repo:/root/.axon_site python -u -m \
        rnnt_tpu.cli.run_rnnt --mode test --data_dir "$DATA" \
        --output_dir "$BASE/$arm" --checkpoint "$BASE/$arm" \
        --batch_size 32 --pad_frames 192 --pad_tokens 64
    done
    ;;
  *) echo "usage: banded_ab.sh [exact|banded|evals]"; exit 2;;
esac
