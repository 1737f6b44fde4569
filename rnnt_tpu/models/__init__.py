"""Model stack: projected-LSTM encoder, prediction network, additive joint."""

from rnnt_tpu.models.transducer import (  # noqa: F401
    Transducer,
    init_transducer_params,
)
