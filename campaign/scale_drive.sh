#!/bin/bash
# Curriculum-at-scale driver (round 5): warm-start the 99h/128k-utterance
# corpus run from the converged 12k-utt checkpoint (--init_from), then keep
# it going across planned preemption recycles until TARGET_STEP.
#
# The watchdog SIGTERMs the trainer when its anonymous RSS crosses MEM_GB
# (the axon tunnel client leaks host memory per input transfer — see
# BASELINE.md endurance section and scripts/leak_probe.py); relaunches
# resume in place via `--checkpoint auto` (which defers to --init_from only
# when the output dir has no checkpoint yet).  PID handling is exact-PID
# via the launcher's $LOG.pid file — never pattern-matched.
set -u
cd /root/repo
TARGET_STEP=${TARGET_STEP:-20000}
MEM_GB=${MEM_GB:-72}
OUT=${OUT:-/root/scale/run}
LOG=${LOG:-/root/scale/train.log}
DRIVELOG=${DRIVELOG:-/root/scale/drive.log}
INIT_FROM=${INIT_FROM:-/root/hedge/run}
ARGS=(--init_from "$INIT_FROM"
      --batch_size 32 --steps_per_log 50
      --steps_per_checkpoint 2000 --eval_size 8
      --pad_frames 192 --pad_tokens 64 --shuffle_buffer 8192
      --config_override optimizer=adam learning_rate=0.0002 warmup_steps=500
      lr_schedule=cosine decay_steps=20000 lr_final_factor=0.05
      grad_clip_norm=0.5 init_blank_bias=-4.0 input_noise_stddev=0.075
      specaug_freq_masks=2 specaug_freq_width=15 specaug_time_masks=2
      specaug_time_width=20)

last_step() {
  # only PUBLISHED checkpoints count: a wedged async save can leave an
  # empty checkpoint_NNNN dir (the atomic publish never ran), which must
  # not satisfy TARGET_STEP or claim a resume point
  ls "$OUT"/checkpoint_*/state.npz 2>/dev/null \
    | grep -oE "checkpoint_[0-9]+" | grep -oE "[0-9]+" | sort -n | tail -1
}

trainer_pid() {
  # exact PID from the launcher's pidfile, validated against /proc cmdline
  local pid
  pid=$(cat "$LOG.pid" 2>/dev/null) || return 1
  [ -n "$pid" ] || return 1
  grep -qa "train_wrapper" "/proc/$pid/cmdline" 2>/dev/null || return 1
  echo "$pid"
}

STALL_S=${STALL_S:-600}

watchdog() {
  local last_seen_step=-1 last_change=$(date +%s) last_pid=-1
  while true; do
    sleep 60
    pid=$(trainer_pid) || continue
    if [ "$pid" != "$last_pid" ]; then
      # fresh trainer: restart the stall clock (restore + compile windows
      # after a relaunch legitimately produce no step lines for minutes)
      last_pid=$pid; last_seen_step=-1; last_change=$(date +%s)
    fi
    anon=$(awk '/RssAnon/{print $2}' /proc/$pid/status 2>/dev/null)
    [ -z "$anon" ] && continue
    if [ "$anon" -gt $((MEM_GB * 1024 * 1024)) ]; then
      echo "[drive] $(date +%H:%M:%S) RssAnon ${anon}kB > ${MEM_GB}GB:" \
           "SIGTERM $pid (planned preemption recycle)" >> "$DRIVELOG"
      kill -TERM "$pid"
      for i in $(seq 1 120); do
        kill -0 "$pid" 2>/dev/null || break
        sleep 5
      done
      # the recycle's checkpoint drain produced no step lines — don't let
      # the stall branch count that window against the next trainer
      last_change=$(date +%s)
      continue
    fi
    # Mid-run wedge detection: the tunnel client can block forever inside a
    # device transfer AFTER steps started flowing (the launcher only guards
    # the pre-step window).  A wedged trainer can't honor SIGTERM (the
    # preemption checkpoint needs a live device), so escalate to SIGKILL
    # and let the relaunch resume from the last published checkpoint.
    # STALL_S must exceed the longest legitimate no-step-line window while
    # steps are flowing (periodic eval: seconds warm; async save dispatch:
    # ~one step) — 600 s is 3-30x margin over both.
    step=$(grep -aoE "step [0-9]+" "$LOG" 2>/dev/null | tail -1 \
           | grep -oE "[0-9]+")
    step=${step:--1}
    now=$(date +%s)
    if [ "$step" != "$last_seen_step" ]; then
      last_seen_step=$step; last_change=$now
    elif [ "$step" -ge 0 ] && [ $((now - last_change)) -gt "$STALL_S" ]; then
      echo "[drive] $(date +%H:%M:%S) no step progress past $step for" \
           "$((now - last_change))s: SIGTERM then SIGKILL $pid (wedge)" \
           >> "$DRIVELOG"
      kill -TERM "$pid"; sleep 30
      kill -0 "$pid" 2>/dev/null && kill -KILL "$pid"
      last_change=$now
    fi
  done
}

watchdog &
WD=$!
trap 'kill $WD 2>/dev/null' EXIT

while true; do
  step=$(last_step)
  step=$((10#${step:-0}))
  if [ "$step" -ge "$TARGET_STEP" ]; then
    echo "[drive] done at step $step" >> "$DRIVELOG"
    break
  fi
  # never two trainers on one tunnel
  while pid=$(trainer_pid); do sleep 10; done
  step=$(last_step); step=$((10#${step:-0}))
  if [ "$step" -ge "$TARGET_STEP" ]; then break; fi
  # epoch budget sized to the REMAINING steps (4000 steps/epoch at B=32 on
  # the 128k-utt corpus): a resumed trainer otherwise re-runs a full fresh
  # --n_epochs budget and overshoots TARGET_STEP by up to 2x
  epochs=$(( (TARGET_STEP - step + 3999) / 4000 ))
  [ "$epochs" -lt 1 ] && epochs=1
  echo "[drive] $(date +%H:%M:%S) (re)launching from step $step" \
       "(n_epochs $epochs)" >> "$DRIVELOG"
  DATA=/root/endurance/data WAIT_S=420 TRIES=10 \
    bash campaign/launch.sh "$LOG" "$OUT" \
    --n_epochs "$epochs" "${ARGS[@]}" >> /root/scale/launcher.out 2>&1
  sleep 5
done
