"""Configuration for the rnnt_tpu framework.

One frozen dataclass replaces the reference's three config mechanisms
(TensorBoard HParam constants in hparams.py:3-37, absl runtime flags in
run_rnnt.py:26-64, and the hparams.json sidecar in utils/model.py:9-18).
Field defaults reproduce the reference's parity configuration
(hparams.py:3-24,37); `save`/`load` keep the "hparams travel with the
checkpoint" behaviour (run_rnnt.py:137-140, transcribe_file.py:16-18).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RNNTConfig:
    """Model + frontend + training hyperparameters (ref: hparams.py:3-37)."""

    # Tokenization (ref: hparams.py:3-4)
    token_type: str = "word-piece"          # "word-piece" | "character"
    vocab_size: int = 4096                  # 2**12

    # Feature frontend (ref: hparams.py:7-12)
    mel_bins: int = 80
    frame_length: float = 0.025             # seconds
    frame_step: float = 0.01                # seconds
    hertz_low: float = 125.0
    hertz_high: float = 7600.0
    downsample_factor: int = 3              # frame stacking (preprocessing.py:84-94)
    sample_rate: int = 16000

    # Model (ref: hparams.py:15-24)
    embedding_size: int = 500
    encoder_layers: int = 8
    encoder_size: int = 2048                # LSTM hidden size
    projection_size: int = 640              # LSTM output projection
    time_reduction_index: int = 1           # after this encoder layer
    time_reduction_factor: int = 2
    pred_net_layers: int = 2
    pred_net_size: int = 2048
    joint_size: int = 640
    dropout: float = 0.0
    # Initial bias on the blank logit (id 0) in the joint output layer.
    # 0.0 = exact reference init (Keras Dense zeros, model.py:158-166).
    # A NEGATIVE value counteracts the blank-sink local optimum RNN-T
    # training falls into at depth (the lattice posterior mass collapses
    # onto the all-blank path early and argmax never emits): starting with
    # blank de-emphasized keeps label gradients alive while the encoder is
    # still random.  Training-dynamics knob only — the converged model
    # relearns whatever bias it wants.
    init_blank_bias: float = 0.0

    # Optimization (ref: hparams.py:37, run_rnnt.py:483-488)
    learning_rate: float = 1e-4
    momentum: float = 0.9
    # "sgd" = reference parity (SGD + momentum).  "adam" (beyond-ref) is
    # what converges at parity depth — see train/state.make_optimizer.
    optimizer: str = "sgd"
    grad_clip_norm: float = 0.0             # 0 = off (reference has none)
    # LR schedule (beyond-ref; the reference is constant-lr only).  Deep
    # LSTM stacks at parity scale see 100x-over-clip gradient norms for the
    # first few hundred steps — warmup lets the steady-state lr be chosen
    # for the steady state.  warmup_steps=0 + "constant" == exact ref
    # behaviour (and the round-1 checkpoint/opt-state layout).
    warmup_steps: int = 0                   # linear 0 -> learning_rate
    lr_schedule: str = "constant"           # "constant" | "cosine"
    decay_steps: int = 0                    # cosine horizon (after warmup)
    lr_final_factor: float = 0.0            # cosine floor, fraction of peak
    # Gaussian input-noise augmentation, default off (ref: run_rnnt.py:241-242
    # noise=0; the commented-in value there was 0.075)
    input_noise_stddev: float = 0.0
    # SpecAugment (beyond-ref; ops/specaug.py) — all off by default.
    # freq_width in mel bins (of mel_bins, masked across every stacked
    # copy); time_width in stacked frames (= downsample_factor hops each),
    # confined to each utterance's real length.
    specaug_freq_masks: int = 0
    specaug_freq_width: int = 15
    specaug_time_masks: int = 0
    specaug_time_width: int = 20

    # Precision policy (ref: run_rnnt.py:96-99 mixed_float16; TPU uses bf16,
    # no loss scaling needed — lattice math stays fp32 inside the loss).
    compute_dtype: str = "float32"          # "float32" | "bfloat16"

    # Banded (pruned) loss: label-window width for loss_impl="banded"
    # (ops/joint_loss_banded.py) — a lower-bound objective computing the
    # joint V-reduction only near the expected alignment diagonal; 32 keeps
    # the bound tight at parity scale while cutting loss compute ~(U+1)/band
    loss_band: int = 32

    # LSTM implementation: "auto" (Pallas VMEM-resident sequence kernel on
    # TPU with aligned shapes, lax.scan otherwise), "pallas", or "scan".
    # Tensor-parallel runs (model_parallel_size > 1) want "scan": GSPMD can
    # column/row-shard the scan's gate matmuls over the 'model' axis, while
    # an opaque pallas_call forces an all-gather of the sharded weights.
    lstm_impl: str = "auto"

    # Decoding
    max_symbols_per_frame: int = 30         # bound for jit-able greedy decode
    beam_width: int = 4

    # Parallelism (ref: run_rnnt.py:93-131 — MirroredStrategy data parallelism;
    # here: named mesh axes consumed by rnnt_tpu.parallel)
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    model_parallel_size: int = 1

    def __post_init__(self):
        # The additive joint requires encoder output width == projection_size,
        # so TimeReduction (which widens features by its factor) must not be
        # the last encoder layer (true of the parity config: index 1 of 8,
        # hparams.py:16,19; the reference model would also break otherwise).
        if self.time_reduction_index >= self.encoder_layers - 1 and \
                self.encoder_layers > 0 and self.time_reduction_index >= 0:
            raise ValueError(
                f"time_reduction_index={self.time_reduction_index} must be < "
                f"encoder_layers-1={self.encoder_layers - 1}")

    # --- derived ---
    @property
    def input_feat_size(self) -> int:
        """Encoder input width = mel_bins * frame stacking (model.py:124)."""
        return self.mel_bins * self.downsample_factor

    @property
    def frame_length_samples(self) -> int:
        return int(round(self.sample_rate * self.frame_length))

    @property
    def frame_step_samples(self) -> int:
        return int(round(self.sample_rate * self.frame_step))

    def replace(self, **kw) -> "RNNTConfig":
        return dataclasses.replace(self, **kw)

    # --- persistence (ref: utils/model.py:9-18 save/load_hparams) ---
    SIDCAR_NAME = "config.json"

    def save(self, directory: str, filename: str = "config.json") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, filename)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, sort_keys=True)
        return path

    @classmethod
    def load(cls, directory: str, filename: str = "config.json") -> "RNNTConfig":
        path = os.path.join(directory, filename)
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


def tiny_config(**overrides) -> RNNTConfig:
    """A debug-scale config (mirrors the commented alternates, hparams.py:26-35)."""
    base = dict(
        token_type="character",
        vocab_size=31,
        embedding_size=32,
        encoder_layers=2,
        encoder_size=64,
        projection_size=48,
        pred_net_layers=1,
        pred_net_size=64,
        joint_size=32,
        mel_bins=16,
        downsample_factor=1,
        time_reduction_index=0,
    )
    base.update(overrides)
    return RNNTConfig(**base)
