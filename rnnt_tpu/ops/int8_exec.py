"""True int8 execution for quantized matmul weights.

`ops.quantize` stores weights as int8 {"q","s"} leaves but reconstitutes
bf16/fp32 at load ("storage quantization" — saves disk, not HBM or FLOPs).
This module makes the quantized leaves *executable*: model matmuls route
through `qdot`, which dynamically quantizes the activations per row and
issues an int8 x int8 -> int32 `lax.dot_general` — the v5e MXU runs int8 at
2x its bf16 rate, and the weight HBM traffic halves vs bf16.

The reference's provenance (README.md:7 -> arXiv:1811.06621) is on-device
*execution* of the quantized model, not just smaller files; its own
quantize_model.py (TFLite dynamic-range quantization) would also have
computed int8 matmuls with dynamically-quantized activations — this is the
TPU-native equivalent of exactly that scheme:

  weights:     symmetric per-output-channel int8, fp32 scales (ops.quantize)
  activations: symmetric per-row (per-token) int8, scales computed on the fly
  accumulate:  int32 on the MXU, rescaled to fp32 by (act_scale x w_scale)

`qdot`/`qtake`/`act_dtype` also accept plain arrays and fall back to the
normal fp path, so model code calls them unconditionally; a param tree can
mix quantized and fp leaves (e.g. int8 prediction+joint with a bf16 Pallas
encoder — the measured-winning split, BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_quant(w) -> bool:
    """True for an int8 weight leaf ({"q": int8 W, "s": fp32 scale})."""
    return isinstance(w, dict) and set(w) == {"q", "s"}


def weight_shape(w):
    return w["q"].shape if is_quant(w) else w.shape


def act_dtype(w):
    """dtype activations should be cast to before a matmul against `w`.

    For int8 leaves the activations are quantized inside `qdot`, so any fp
    dtype works — use fp32 so the dynamic range estimate is exact."""
    return jnp.float32 if is_quant(w) else w.dtype


def qdot(x: jnp.ndarray, w, *, preferred_element_type=jnp.float32):
    """x @ w with `w` either a plain array or an int8 {"q","s"} leaf.

    int8 path: per-row symmetric activation quantization (scale = row
    absmax/127), int8 x int8 -> int32 dot_general, fp32 rescale by
    (act_scale * per-channel weight scale).  Zero rows quantize to zeros and
    rescale by a clamped scale — no NaN.
    """
    if not is_quant(w):
        return jnp.dot(x, w, preferred_element_type=preferred_element_type)
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(a, 1e-12) / 127.0
    xi = jnp.round(xf / a_scale).astype(jnp.int8)  # |x|/a_scale <= 127 already
    yi = jax.lax.dot_general(
        xi, w["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * a_scale * w["s"].astype(jnp.float32)
    if preferred_element_type is not None:
        y = y.astype(preferred_element_type)
    return y


def qtake(embed, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup with an optionally-int8 table.

    int8 path: gather int8 rows (1 byte/elem of HBM traffic) then rescale by
    the per-dimension fp32 scale — fp32 activations out.
    """
    if not is_quant(embed):
        return jnp.take(embed, ids, axis=0)
    rows = jnp.take(embed["q"], ids, axis=0).astype(jnp.float32)
    return rows * embed["s"].astype(jnp.float32)
