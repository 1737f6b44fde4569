#!/bin/bash
# Endurance-run driver: keeps the 40k-step run going across planned
# preemption recycles.  A watchdog SIGTERMs the trainer (exact PID) when
# its anonymous RSS crosses MEM_GB — the axon plugin leaks host memory per
# input transfer (see BASELINE.md endurance section) — which exercises the
# preemption-checkpoint path; this loop then relaunches with
# --checkpoint auto until the target step count is reached.
set -u
cd /root/repo
TARGET_STEP=${TARGET_STEP:-40000}
MEM_GB=${MEM_GB:-72}
ARGS=(--batch_size 32 --n_epochs 10 --steps_per_log 50
      --steps_per_checkpoint 2000 --eval_size 8
      --pad_frames 192 --pad_tokens 64 --shuffle_buffer 8192
      --config_override optimizer=adam learning_rate=0.0002 warmup_steps=500
      lr_schedule=cosine decay_steps=40000 lr_final_factor=0.05
      grad_clip_norm=0.5 init_blank_bias=-4.0 input_noise_stddev=0.075
      specaug_freq_masks=2 specaug_freq_width=15 specaug_time_masks=2
      specaug_time_width=20)

last_step() {
  ls /root/endurance/run 2>/dev/null | grep -oE "checkpoint_[0-9]+" \
    | grep -oE "[0-9]+" | sort -n | tail -1
}

watchdog() {
  while true; do
    sleep 60
    pid=$(pgrep -f "campaign/train_wrapper.py" | head -1)
    [ -z "$pid" ] && continue
    anon=$(awk '/RssAnon/{print $2}' /proc/$pid/status 2>/dev/null)
    [ -z "$anon" ] && continue
    if [ "$anon" -gt $((MEM_GB * 1024 * 1024)) ]; then
      echo "[drive] $(date +%H:%M:%S) RssAnon ${anon}kB > ${MEM_GB}GB:" \
           "SIGTERM $pid (planned preemption recycle)" >> /root/endurance/drive.log
      kill -TERM "$pid"
      # wait for the preemption checkpoint + clean exit of this exact pid
      for i in $(seq 1 120); do
        kill -0 "$pid" 2>/dev/null || break
        sleep 5
      done
    fi
  done
}

watchdog &
WD=$!
trap 'kill $WD 2>/dev/null' EXIT

while true; do
  step=$(last_step)
  step=${step:-0}
  # force base-10: checkpoint names are zero-padded
  step=$((10#$step))
  if [ "$step" -ge "$TARGET_STEP" ]; then
    echo "[drive] done at step $step" >> /root/endurance/drive.log
    break
  fi
  # never two trainers on one tunnel
  while pgrep -f "campaign/train_wrapper.py" > /dev/null; do sleep 10; done
  step=$(last_step); step=$((10#${step:-0}))
  if [ "$step" -ge "$TARGET_STEP" ]; then break; fi
  echo "[drive] $(date +%H:%M:%S) (re)launching from step $step" >> /root/endurance/drive.log
  DATA=/root/endurance/data WAIT_S=420 TRIES=10 \
    bash campaign/launch.sh /root/endurance/train.log /root/endurance/run \
    "${ARGS[@]}" >> /root/endurance/launcher.out 2>&1
  sleep 5
done
