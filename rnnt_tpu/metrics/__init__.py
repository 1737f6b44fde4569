"""Quality metrics: edit-distance accuracy, CER, WER (ref: utils/metrics.py)."""

from rnnt_tpu.metrics.edit_distance import (  # noqa: F401
    edit_distance,
    error_rate,
    accuracy,
    wer,
    cer,
)
