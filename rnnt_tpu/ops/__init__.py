"""Compute ops: RNN-T loss (reference + Pallas TPU kernel) and the audio frontend."""

from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_ref  # noqa: F401
from rnnt_tpu.ops.rnnt_loss import rnnt_loss  # noqa: F401
