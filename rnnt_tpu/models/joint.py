"""Additive joint network.

Re-design of the reference joint (model.py:158-166, reused at decode time by
utils/decoding.py:6-18): broadcast-add encoder [B,T,1,P] + prediction
[B,1,U+1,P], Dense(joint_size, tanh), Dense(vocab).

TPU note: the two Dense layers are applied to the *pre-broadcast* [B,T,P] and
[B,1+U,P] tensors when mathematically equivalent — the first Dense is linear,
so  W(h_enc + h_pred) = W h_enc + W h_pred : we project each side separately
([B,T,J] + [B,U,J] matmuls, MXU-sized) and only materialize the broadcast sum
at [B,T,U,J] for the tanh + final projection.  This cuts the big-lattice
matmul count and keeps the [B,T,U,V] logits as the single large tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.ops.int8_exec import act_dtype, qdot


def init_joint_params(key, cfg: RNNTConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)

    def glorot(k, shape):
        lim = (6.0 / (shape[0] + shape[1])) ** 0.5
        return jax.random.uniform(k, shape, dtype, -lim, lim)

    b2 = jnp.zeros((cfg.vocab_size,), dtype)
    if cfg.init_blank_bias:
        # de-emphasize blank at init (config.init_blank_bias docstring)
        b2 = b2.at[0].set(jnp.asarray(cfg.init_blank_bias, dtype))
    return {
        "w1": glorot(k1, (cfg.projection_size, cfg.joint_size)),
        "b1": jnp.zeros((cfg.joint_size,), dtype),
        "w2": glorot(k2, (cfg.joint_size, cfg.vocab_size)),
        "b2": b2,
    }


def joint_project(params, enc: jnp.ndarray, pred: jnp.ndarray):
    """Project each side through the (shared) first Dense: [.., P] -> [.., J]."""
    f = qdot(enc, params["w1"], preferred_element_type=jnp.float32)
    g = qdot(pred, params["w1"], preferred_element_type=jnp.float32)
    return f, g


def joint_logits(params, enc: jnp.ndarray, pred: jnp.ndarray):
    """Full lattice logits [B, T, U+1, V] from enc [B,T,P], pred [B,U+1,P]."""
    f, g = joint_project(params, enc, pred)
    h = jnp.tanh(
        f[:, :, None, :] + g[:, None, :, :] + params["b1"].astype(jnp.float32)
    ).astype(act_dtype(params["w2"]))
    return (
        qdot(h, params["w2"], preferred_element_type=jnp.float32)
        + params["b2"].astype(jnp.float32)
    )


def joint_step(params, enc_t: jnp.ndarray, pred_u: jnp.ndarray):
    """Single-cell joint for decoding: enc_t [B,P], pred_u [B,P] -> [B,V].

    Equivalent of utils/decoding.py:6-18 but batched and state-free.
    """
    h = jnp.tanh(
        qdot(enc_t + pred_u, params["w1"], preferred_element_type=jnp.float32)
        + params["b1"].astype(jnp.float32)
    ).astype(act_dtype(params["w2"]))
    return (
        qdot(h, params["w2"], preferred_element_type=jnp.float32)
        + params["b2"].astype(jnp.float32)
    )
