"""rnnt_tpu — a TPU-native RNN-Transducer speech-recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
noahchalifour/rnnt-speech-recognition (TF2 + CUDA warp-transducer):

- ``rnnt_tpu.config``    — single frozen dataclass config (ref: hparams.py, utils/model.py)
- ``rnnt_tpu.ops``       — RNN-T loss (pure-JAX reference + fused Pallas TPU kernel,
                           ref: warp-transducer submodule), log-mel feature frontend
                           (ref: utils/preprocessing.py)
- ``rnnt_tpu.models``    — projected-LSTM encoder, prediction network, additive joint
                           (ref: model.py)
- ``rnnt_tpu.parallel``  — device mesh / NamedSharding rules (ref: run_rnnt.py
                           configure_environment / MirroredStrategy)
- ``rnnt_tpu.data``      — corpus adapters, tokenizers, record shards, batching
                           (ref: utils/data/*, utils/encoding.py, utils/preprocessing.py)
- ``rnnt_tpu.train``     — train/eval engine, checkpointing, observability
                           (ref: run_rnnt.py)
- ``rnnt_tpu.decode``    — greedy / beam / streaming transducer decoding
                           (ref: utils/decoding.py, streaming_transcribe.py)
- ``rnnt_tpu.metrics``   — edit-distance accuracy / WER / CER (ref: utils/metrics.py)
- ``rnnt_tpu.cli``       — command-line entry points (ref: run_rnnt.py, preprocess_*.py,
                           transcribe_file.py, streaming_transcribe.py, quantize_model.py)
- ``rnnt_tpu.native``    — C++ runtime components (audio decode, record IO, CPU loss)
"""

__version__ = "0.1.0"

from rnnt_tpu.config import RNNTConfig  # noqa: F401
