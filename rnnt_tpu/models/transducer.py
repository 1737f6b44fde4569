"""The full RNN-Transducer model: encoder + prediction net + joint.

Functional equivalent of the reference's `build_keras_model` (model.py:119-169)
with streaming state made explicit (Keras `stateful=True`, model.py:126-128 ->
a state pytree threaded by the caller).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.models import encoder as enc_mod
from rnnt_tpu.models import joint as joint_mod
from rnnt_tpu.models import prediction as pred_mod


def init_transducer_params(key, cfg: RNNTConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": enc_mod.init_encoder_params(k1, cfg, dtype),
        "prediction": pred_mod.init_prediction_params(k2, cfg, dtype),
        "joint": joint_mod.init_joint_params(k3, cfg, dtype),
    }


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


@dataclasses.dataclass(frozen=True)
class Transducer:
    """Thin namespace bundling the model functions around a config."""

    cfg: RNNTConfig

    def init(self, key, dtype=jnp.float32):
        return init_transducer_params(key, self.cfg, dtype)

    def apply(
        self,
        params,
        mel_specs: jnp.ndarray,     # [B, T, feat] float
        pred_inp: jnp.ndarray,      # [B, U+1] int32 (0-prepended labels)
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Full forward: logits [B, T', U+1, V] (+ updated batchnorm stats).

        Mirrors `model([mel_specs, pred_inp])` (run_rnnt.py:269) but returns
        the batch-norm running stats explicitly so the train step can thread
        them (Keras hid this as layer state).
        """
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        encoded, _, bn_stats = enc_mod.encode(
            params["encoder"], self.cfg, mel_specs, training=training, rng=rngs[0])
        pred_out, _ = pred_mod.predict(
            params["prediction"], self.cfg, pred_inp, training=training, rng=rngs[1])
        logits = joint_mod.joint_logits(params["joint"], encoded, pred_out)
        return logits, bn_stats

    # --- decoding-oriented pieces ---

    def encode(self, params, mel_specs, state=None):
        encoded, new_state, _ = enc_mod.encode(
            params["encoder"], self.cfg, mel_specs, training=False, state=state)
        return encoded, new_state

    def predict_step(self, params, tokens, state):
        """One prediction-net step: tokens [B] -> (pred_out [B, P], new_state)."""
        out, new_state = pred_mod.predict(
            params["prediction"], self.cfg, tokens[:, None],
            training=False, state=state)
        return out[:, 0], new_state

    def prediction_zero_state(self, batch: int, dtype=jnp.float32):
        return pred_mod.prediction_zero_state(self.cfg, batch, dtype)

    def encoder_zero_state(self, batch: int, dtype=jnp.float32):
        return enc_mod.encoder_zero_state(self.cfg, batch, dtype)

    def joint_step(self, params, enc_t, pred_u):
        return joint_mod.joint_step(params["joint"], enc_t, pred_u)

    def encoded_length(self, spec_lengths):
        return enc_mod.encoded_length(self.cfg, spec_lengths)
