"""Projected LSTM for TPU, plus TimeReduction and LayerNorm.

TPU-native redesign of the reference's `tf.compat.v1.nn.rnn_cell.LSTMCell
(num_proj=...)` layers (model.py:59-60,103-104) and `TimeReduction`
(model.py:8-36):

- The input projection x_t @ W_x for ALL timesteps is hoisted out of the
  recurrence into one [B*T, F] x [F, 4H] matmul — a single large MXU op —
  so the `lax.scan` body only carries the recurrent h_t @ W_h matmul and
  elementwise gate math.  This is the difference between MXU-bound and
  launch-bound LSTMs on TPU.
- State h is the *projected* output (size P), so the recurrent matmul is
  [B, P] x [P, 4H] (P=640 vs H=2048 in the parity config — 3.2x less
  recurrent FLOPs/bytes, same as the reference's projected cell).
- All matmuls request fp32 accumulation (`preferred_element_type`) so bf16
  params keep a stable cell state; the cell state c is carried in fp32.

Parameter pytree per layer:
  wx [F, 4H], wh [P, 4H], bias [4H], wp [H, P]
Gate order: i, g (cell candidate), f, o.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rnnt_tpu.ops.int8_exec import act_dtype, is_quant, qdot, weight_shape


def init_lstm_params(key, input_size: int, hidden_size: int, proj_size: int,
                     dtype=jnp.float32, forget_bias: float = 1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    # Glorot-uniform, matching Keras-era defaults for the recurrent stack.
    def glorot(k, shape):
        lim = (6.0 / (shape[0] + shape[1])) ** 0.5
        return jax.random.uniform(k, shape, dtype, -lim, lim)

    bias = jnp.zeros((4 * hidden_size,), dtype)
    # forget-gate bias init = 1 (standard LSTMCell behaviour)
    bias = bias.at[2 * hidden_size: 3 * hidden_size].set(forget_bias)
    return {
        "wx": glorot(k1, (input_size, 4 * hidden_size)),
        "wh": glorot(k2, (proj_size, 4 * hidden_size)),
        "bias": bias,
        "wp": glorot(k3, (hidden_size, proj_size)),
    }


def lstm_zero_state(batch: int, hidden_size: int, proj_size: int, dtype=jnp.float32):
    """(c, h) carried state; c in fp32 regardless of compute dtype."""
    return (
        jnp.zeros((batch, hidden_size), jnp.float32),
        jnp.zeros((batch, proj_size), dtype),
    )


def _gates_step(params, x_proj_t, state):
    """One recurrence step given the precomputed input projection."""
    c, h = state
    z = x_proj_t + qdot(
        h, params["wh"], preferred_element_type=jnp.float32
    ) + params["bias"].astype(jnp.float32)
    i, g, f, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    hidden = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    h_new = qdot(
        hidden.astype(act_dtype(params["wp"])), params["wp"],
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)
    return c_new, h_new


def _pallas_eligible(params, B: int, T: int) -> bool:
    """Use the VMEM-resident Pallas sequence kernel when it pays off:
    TPU backend, lane-aligned dims, batch divisible into sublane blocks,
    enough timesteps to amortize.  (The scan path stays for CPU tests,
    tiny debug configs, single-step decode, and int8-exec weights — the
    Pallas sequence kernel is bf16/fp32 only.)"""
    import jax as _jax

    if any(is_quant(params[k]) for k in ("wx", "wh", "wp")):
        return False
    H, P = params["wp"].shape
    try:
        on_tpu = _jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return (on_tpu and B % 8 == 0 and T >= 8
            and H % 128 == 0 and P % 128 == 0)


def lstm_layer(
    params,
    x: jnp.ndarray,
    state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    unroll: int = 8,
    inference: bool = False,
    impl: str = "auto",
):
    """Run a projected-LSTM over [B, T, F] -> ([B, T, P], final_state).

    `state` enables the stateful/streaming mode the reference exposes via
    Keras `stateful=True` (model.py:46-52): pass the previous chunk's final
    state, thread the returned one into the next chunk.

    On TPU with aligned shapes this dispatches to the Pallas sequence kernel
    (rnnt_tpu.ops.lstm_pallas) — same math, weights pinned in VMEM across
    the whole sequence (2x faster at parity scale, measured on v5e).
    """
    B, T, F = x.shape
    H, P = weight_shape(params["wp"])
    if state is None:
        state = lstm_zero_state(B, H, P, x.dtype)

    use_pallas = (impl == "pallas" or
                  (impl == "auto" and _pallas_eligible(params, B, T)))
    if use_pallas:
        if inference:
            # no BPTT residual emission (decode/eval path; not differentiable)
            from rnnt_tpu.ops.lstm_pallas import lstm_seq_infer

            return lstm_seq_infer(params, x, state)
        from rnnt_tpu.ops.lstm_pallas import lstm_seq

        return lstm_seq(params, x, state)

    # Hoisted input projection: one big MXU matmul over all timesteps.
    x_proj = qdot(
        x.reshape(B * T, F), params["wx"], preferred_element_type=jnp.float32
    ).reshape(B, T, 4 * H)

    def step(carry, xp_t):
        c, h = _gates_step(params, xp_t, carry)
        return (c, h), h

    (c_fin, h_fin), hs = jax.lax.scan(
        step, state, jnp.moveaxis(x_proj, 1, 0), unroll=unroll
    )
    return jnp.moveaxis(hs, 0, 1), (c_fin, h_fin)


# ---------------- LayerNorm (ref: model.py:71,113) ----------------

def init_layernorm_params(size: int, dtype=jnp.float32):
    return {"scale": jnp.ones((size,), dtype), "bias": jnp.zeros((size,), dtype)}


def layer_norm(params, x, eps: float = 1e-3):
    # eps matches Keras LayerNormalization default (1e-3).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"].astype(jnp.float32)
            + params["bias"].astype(jnp.float32)).astype(x.dtype)


# ---------------- BatchNorm on inputs (ref: model.py:57) ----------------

def init_batchnorm_params(size: int, dtype=jnp.float32):
    return {
        "scale": jnp.ones((size,), dtype),
        "bias": jnp.zeros((size,), dtype),
        # non-trainable running stats, threaded functionally
        "mean": jnp.zeros((size,), jnp.float32),
        "var": jnp.ones((size,), jnp.float32),
    }


def batch_norm(params, x, *, training: bool, momentum: float = 0.99,
               eps: float = 1e-3):
    """Feature-wise batch norm over [B, T, F]; returns (y, new_stats).

    Functional replacement for the Keras BatchNormalization the reference puts
    on the encoder input (model.py:57); running stats ride in the param tree
    as non-trainable leaves.
    """
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
        new_stats = {
            "mean": momentum * params["mean"] + (1 - momentum) * mean,
            "var": momentum * params["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = params["mean"], params["var"]
        new_stats = {"mean": params["mean"], "var": params["var"]}
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_stats


# ---------------- TimeReduction (ref: model.py:8-36) ----------------

def time_reduction(x: jnp.ndarray, factor: int):
    """Concat `factor` adjacent frames: [B, T, F] -> [B, ceil(T/f), F*f].

    Matches the reference's pad-to-multiple semantics (model.py:33-36): the
    tail is zero-padded, so output length is ceil(T/factor) — which is also
    why the loss rescales lengths with ceil (loss.py:31-33).
    """
    B, T, F = x.shape
    pad = (-T) % factor
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(B, (T + pad) // factor, F * factor)


def reduced_length(lengths: jnp.ndarray, factor: int):
    """Valid-frame count after time_reduction: ceil(len / factor)."""
    return -(-lengths // factor)


def dropout(key, x, rate: float, training: bool):
    if not training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
