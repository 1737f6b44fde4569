"""Audio encoder: input BatchNorm + stacked projected-LSTMs with TimeReduction.

Re-design of the reference encoder (model.py:39-81): BatchNorm on the input
mel frames (:57), `encoder_layers` x { projected LSTM -> Dropout -> LayerNorm }
(:59-71), with a TimeReduction inserted after layer `time_reduction_index`
(:73-78).  Functional: params/state in, activations/state out; the carried
per-layer LSTM state makes this the streaming encoder too
(streaming_transcribe.py:34's stateful=True equivalent).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.models import lstm as L


def init_encoder_params(key, cfg: RNNTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.encoder_layers + 1)
    feat = cfg.input_feat_size
    layers = []
    in_size = feat
    for i in range(cfg.encoder_layers):
        layers.append({
            "lstm": L.init_lstm_params(
                keys[i], in_size, cfg.encoder_size, cfg.projection_size, dtype),
            "ln": L.init_layernorm_params(cfg.projection_size, dtype),
        })
        in_size = cfg.projection_size
        if i == cfg.time_reduction_index:
            in_size *= cfg.time_reduction_factor
    return {"bn": L.init_batchnorm_params(feat, dtype), "layers": layers}


def encoder_zero_state(cfg: RNNTConfig, batch: int, dtype=jnp.float32):
    return [
        L.lstm_zero_state(batch, cfg.encoder_size, cfg.projection_size, dtype)
        for _ in range(cfg.encoder_layers)
    ]


def encode(
    params,
    cfg: RNNTConfig,
    mel_specs: jnp.ndarray,           # [B, T, feat]
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    state: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
):
    """Returns (encoded [B, T', P], new_state, new_bn_stats).

    T' = ceil(T / time_reduction_factor) (one reduction — model.py:73-78).
    """
    x, bn_stats = L.batch_norm(params["bn"], mel_specs, training=training)
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
        if i == cfg.time_reduction_index:
            x = L.time_reduction(x, cfg.time_reduction_factor)
    return x, new_state, bn_stats


def encoded_length(cfg: RNNTConfig, spec_lengths: jnp.ndarray):
    """Valid output frames for given input frame counts (loss.py:31-33).

    time_reduction_index < 0 disables the reduction entirely."""
    if cfg.time_reduction_index < 0:
        return spec_lengths
    return L.reduced_length(spec_lengths, cfg.time_reduction_factor)
