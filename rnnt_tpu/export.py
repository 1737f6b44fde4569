"""Serialized model export via jax.export (StableHLO).

The working replacement for the reference's broken TFLite export
(quantize_model.py:8-29 — its `model_utils.load_model` never existed,
SURVEY.md §2.5 quirk 1), re-imagined for TPU/portable serving: instead of a
TFLite flatbuffer, the deployable artifact is a **serialized StableHLO
module** produced by `jax.export` — loadable from any JAX process (C++
serving stacks consume the same bytes through PjRT) with no dependency on
this package or on Python model code.

Two artifacts cover the reference's inference surfaces:

- `streaming_step`: the chunked stateful decode step
  (params, mel_chunk [Tc,F], enc_state, carry) -> (tokens, n, enc_state,
  carry) — the Keras `stateful=True` serving path (streaming_transcribe.py:34)
  as one pure function with explicit state.
- `transcribe`: full-utterance batched greedy decode
  (params, mel [B,T,F], spec_lengths) -> (tokens, lengths).

Both embed weights as constants by default (a self-contained artifact, like
a TFLite file); `--no-freeze` keeps params as a runtime argument instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.decode.greedy import greedy_decode, greedy_decode_encoded
from rnnt_tpu.models.transducer import Transducer


def _streaming_fn(cfg: RNNTConfig, max_tokens_per_chunk: int):
    model = Transducer(cfg)

    def step(params, mel_chunk, enc_state, carry):
        encoded, new_enc_state = model.encode(
            params, mel_chunk[None], state=enc_state)
        enc_len = jnp.full((1,), encoded.shape[1], jnp.int32)
        tokens, lengths, new_carry = greedy_decode_encoded(
            model, params, encoded, enc_len,
            max_output_length=max_tokens_per_chunk, carry=carry)
        return tokens[0], lengths[0], new_enc_state, new_carry

    return step


def streaming_init_state(cfg: RNNTConfig, dtype=jnp.float32):
    """(enc_state, carry) zero state for the exported streaming step."""
    model = Transducer(cfg)
    enc_state = model.encoder_zero_state(1, dtype)
    pred_state = model.prediction_zero_state(1, dtype)
    return enc_state, pred_state


def export_streaming_step(
    params,
    cfg: RNNTConfig,
    *,
    chunk_frames: int = 4,
    max_tokens_per_chunk: int = 64,
    platforms: Sequence[str] = ("tpu", "cpu"),
    freeze_params: bool = True,
) -> Tuple[bytes, dict]:
    """Serialize the streaming decode step; returns (bytes, meta)."""
    model = Transducer(cfg)
    step = _streaming_fn(cfg, max_tokens_per_chunk)
    enc_state, pred_state = streaming_init_state(cfg)
    # carry after consuming the start token (greedy_decode_encoded contract)
    pred_out, pred_state = model.predict_step(
        params, jnp.zeros((1,), jnp.int32), pred_state)
    carry = (pred_out, pred_state)
    mel = jnp.zeros((chunk_frames, cfg.input_feat_size), jnp.float32)

    if freeze_params:
        fn = jax.jit(lambda m, s, c: step(params, m, s, c))
        args = (mel, enc_state, carry)
    else:
        fn = jax.jit(step)
        args = (params, mel, enc_state, carry)
    exp = jax_export.export(fn, platforms=list(platforms))(*args)
    meta = {
        "kind": "streaming_step",
        "chunk_frames": chunk_frames,
        "max_tokens_per_chunk": max_tokens_per_chunk,
        "platforms": list(platforms),
        "frozen_params": freeze_params,
        "input_feat_size": cfg.input_feat_size,
        "calling_convention": (
            "(mel [Tc,F], enc_state, carry) -> (tokens, n, enc_state, carry)"
            if freeze_params else
            "(params, mel [Tc,F], enc_state, carry) -> "
            "(tokens, n, enc_state, carry)"),
    }
    return exp.serialize(), meta


def export_transcribe(
    params,
    cfg: RNNTConfig,
    *,
    batch: int = 1,
    frames: int = 512,
    max_output_length: int = 200,
    platforms: Sequence[str] = ("tpu", "cpu"),
    freeze_params: bool = True,
) -> Tuple[bytes, dict]:
    """Serialize full-utterance batched greedy decode; returns (bytes, meta)."""
    model = Transducer(cfg)

    def fn(params, mel, spec_lengths):
        return greedy_decode(model, params, mel, spec_lengths,
                             max_output_length=max_output_length)

    mel = jnp.zeros((batch, frames, cfg.input_feat_size), jnp.float32)
    lens = jnp.full((batch,), frames, jnp.int32)
    if freeze_params:
        jitted = jax.jit(lambda m, l: fn(params, m, l))
        args = (mel, lens)
    else:
        jitted = jax.jit(fn)
        args = (params, mel, lens)
    exp = jax_export.export(jitted, platforms=list(platforms))(*args)
    meta = {
        "kind": "transcribe",
        "batch": batch,
        "frames": frames,
        "max_output_length": max_output_length,
        "platforms": list(platforms),
        "frozen_params": freeze_params,
        "input_feat_size": cfg.input_feat_size,
        "calling_convention": (
            "(mel [B,T,F], spec_lengths [B]) -> (tokens, lengths)"
            if freeze_params else
            "(params, mel [B,T,F], spec_lengths [B]) -> (tokens, lengths)"),
    }
    return exp.serialize(), meta


def save_artifact(out_dir: str, name: str, blob: bytes, meta: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return path


def load_artifact(path: str):
    """Deserialize an exported artifact; returns the jax.export.Exported
    (call via `.call(*args)`)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
