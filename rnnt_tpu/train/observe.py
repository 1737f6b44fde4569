"""Observability: scalar metrics to JSONL (always) and TensorBoard (optional).

Replaces the reference's tf.summary scalars + HParams plugin registration
(run_rnnt.py:320-324,366-368,199-218; hparams.py:39-47).  JSONL is the source
of truth (grep-able, dependency-free); TensorBoard event files are written too
when `tensorboard` is importable so the reference's workflow keeps working.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Optional

# metric name constants (parity with hparams.py:39-47)
METRIC_TRAIN_LOSS = "train_loss"
METRIC_EVAL_LOSS = "eval_loss"
METRIC_EVAL_ACCURACY = "eval_accuracy"
METRIC_EVAL_CER = "eval_cer"
METRIC_EVAL_WER = "eval_wer"


class MetricsWriter:
    def __init__(self, log_dir: str, run_name: Optional[str] = None):
        run_name = run_name or time.strftime("%Y%m%d-%H%M%S")
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # optional TensorBoard writer
            from tensorboard.summary import Writer  # type: ignore

            self._tb = Writer(self.dir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                try:
                    self._tb.add_scalar(k, float(v), int(step))
                except Exception:
                    pass

    def hparams(self, cfg) -> None:
        """Record the run's hyperparameters (run_rnnt.py:520 hp.hparams).

        JSON sidecar always; when TensorBoard is importable, also an HParams
        plugin session summary (the hp.hparams(...) half of the reference's
        run_rnnt.py:199-218,520 registration; the hparams_config experiment
        summary is implied by the session in modern TB) so runs compare in
        TB's HPARAMS tab.  Reaches through tensorboard.summary.Writer
        internals (no public raw-summary hook exists) —
        tests/test_train_loop.py::test_hparams_plugin_event pins the
        behavior so a TB upgrade can't silently regress it."""
        d = dataclasses.asdict(cfg)
        with open(os.path.join(self.dir, "hparams.json"), "w") as f:
            json.dump(d, f, indent=2, sort_keys=True)
        if self._tb is None:
            return
        try:
            from tensorboard.plugins.hparams import api as hp  # type: ignore

            flat = {k: (v if isinstance(v, (bool, int, float, str))
                        else json.dumps(v)) for k, v in d.items()}
            from tensorboard.compat.proto import event_pb2  # type: ignore

            pb = hp.hparams_pb(flat)
            # tensorboard.summary.Writer exposes no raw-summary hook; feed
            # the plugin summary through its underlying event writer.
            ev = event_pb2.Event(wall_time=time.time(), summary=pb)
            self._tb._output._ev_writer.add_event(ev)  # noqa: SLF001
        except Exception:
            pass

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass
