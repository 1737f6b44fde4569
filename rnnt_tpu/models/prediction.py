"""Prediction (label) network: embedding + stacked projected-LSTMs.

Re-design of the reference prediction_network (model.py:84-116):
Embedding(vocab, embedding_size) (:101) -> pred_net_layers x
{ projected LSTM -> Dropout -> LayerNorm } (:108-113).  Inputs are
right-shifted labels with a prepended start/blank id 0 (`pred_inp`,
preprocessing.py:177-183).  The carried LSTM state is what greedy/beam
decoding threads instead of re-running the network over the whole prefix
(fixing the O(U^2) decode in utils/decoding.py:63).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.models import lstm as L
from rnnt_tpu.ops.int8_exec import qtake


def init_prediction_params(key, cfg: RNNTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.pred_net_layers + 1)
    # Keras Embedding default init: uniform(-0.05, 0.05).
    embed = jax.random.uniform(
        keys[-1], (cfg.vocab_size, cfg.embedding_size), dtype, -0.05, 0.05)
    layers = []
    in_size = cfg.embedding_size
    for i in range(cfg.pred_net_layers):
        layers.append({
            "lstm": L.init_lstm_params(
                keys[i], in_size, cfg.pred_net_size, cfg.projection_size, dtype),
            "ln": L.init_layernorm_params(cfg.projection_size, dtype),
        })
        in_size = cfg.projection_size
    return {"embed": embed, "layers": layers}


def prediction_zero_state(cfg: RNNTConfig, batch: int, dtype=jnp.float32):
    return [
        L.lstm_zero_state(batch, cfg.pred_net_size, cfg.projection_size, dtype)
        for _ in range(cfg.pred_net_layers)
    ]


def predict(
    params,
    cfg: RNNTConfig,
    pred_inp: jnp.ndarray,            # [B, U+1] int32 (0-prepended labels)
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    state: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
):
    """Returns (pred_out [B, U+1, P], new_state)."""
    x = qtake(params["embed"], pred_inp)
    new_state = []
    for i, layer in enumerate(params["layers"]):
        st = state[i] if state is not None else None
        x, st_new = L.lstm_layer(layer["lstm"], x, st,
                                 inference=not training,
                                 impl=cfg.lstm_impl)
        new_state.append(st_new)
        if training and cfg.dropout > 0:
            rng, sub = jax.random.split(rng)
            x = L.dropout(sub, x, cfg.dropout, training)
        x = L.layer_norm(layer["ln"], x)
    return x, new_state
