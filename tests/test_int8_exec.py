"""True int8 execution (ops/int8_exec.py + quantize.int8_exec_params).

The storage-quantization path (dequantize_params) reconstitutes fp weights;
these tests pin the EXECUTING path: int8 x int8 -> int32 dot_generals with
dynamically-quantized activations must match the fp reference within the
expected quantization error, end to end through the decode-side model code
(the qdot/qtake hooks in models/lstm.py, joint.py, prediction.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.config import tiny_config
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.transducer import Transducer, init_transducer_params
from rnnt_tpu.ops.int8_exec import act_dtype, is_quant, qdot, qtake, weight_shape
from rnnt_tpu.ops.quantize import (dequantize_params, int8_exec_params,
                                   quantize_params)


def _quant_leaf(w):
    """Per-output-channel int8 leaf for a single weight (mirrors quantize)."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.max(np.abs(w), axis=tuple(range(w.ndim - 1))), 1e-12) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(s, jnp.float32)}


def test_qdot_matches_fp_within_quant_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    w = rng.normal(size=(64, 96)).astype(np.float32)
    ref = np.asarray(jnp.dot(x, jnp.asarray(w)))
    got = np.asarray(qdot(x, _quant_leaf(w)))
    # int8 weight + int8 activation: relative error ~ 2/127 of the term scale
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    assert np.max(np.abs(got - ref) / denom) < 0.05


def test_qdot_fp_passthrough_and_zero_rows():
    x = jnp.zeros((4, 16), jnp.float32)
    w = jnp.ones((16, 8), jnp.float32)
    # fp leaf: exact passthrough
    assert np.allclose(np.asarray(qdot(x, w)), 0.0)
    # zero activation rows through the int8 path must not NaN
    got = np.asarray(qdot(x, _quant_leaf(np.ones((16, 8), np.float32))))
    assert np.all(np.isfinite(got)) and np.allclose(got, 0.0)


def test_qtake_matches_embedding_lookup():
    rng = np.random.default_rng(1)
    embed = rng.normal(size=(32, 24)).astype(np.float32)
    ids = jnp.asarray([0, 5, 31, 5], jnp.int32)
    ref = np.asarray(jnp.take(jnp.asarray(embed), ids, axis=0))
    got = np.asarray(qtake(_quant_leaf(embed), ids))
    scale = np.max(np.abs(embed), axis=0) / 127.0
    assert np.all(np.abs(got - ref) <= scale + 1e-7)


def test_int8_exec_params_scopes_tree():
    cfg = tiny_config()
    params = init_transducer_params(jax.random.PRNGKey(0), cfg)
    q = quantize_params(params)
    mixed = int8_exec_params(q, jnp.float32)
    # in-scope matmul weights stay int8
    assert is_quant(mixed["joint"]["w2"])
    assert is_quant(mixed["prediction"]["embed"])
    assert is_quant(mixed["prediction"]["layers"][0]["lstm"]["wh"])
    # encoder fully dequantized (Pallas LSTM kernel needs fp weights)
    for leaf in jax.tree_util.tree_leaves(mixed["encoder"]):
        assert leaf.dtype != jnp.int8
    # biases/norms in scope stay fp
    assert mixed["joint"]["b2"].dtype == jnp.float32
    assert weight_shape(mixed["joint"]["w2"]) == params["joint"]["w2"].shape
    assert act_dtype(mixed["joint"]["w2"]) == jnp.float32


def test_dequantize_template_matches_leaf_dtypes():
    """With template=, the dequantized tree's leaf dtypes are IDENTICAL to
    the live tree's — including bf16 passthrough leaves the npz stored as
    fp32 and the fp32 batchnorm stats kept fp32 under bf16.  Dtype drift
    here changes the HLO of every downstream program and silently defeats
    the persistent compile cache (measured 259.7 s vs 8.6 s warm for the
    parity beam eval, round 5)."""
    cfg = tiny_config()
    params = init_transducer_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    assert params["encoder"]["bn"]["mean"].dtype == jnp.float32  # mixed tree
    q = quantize_params(params)

    deq = dequantize_params(q, jnp.bfloat16, template=params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(deq)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        assert a.dtype == b.dtype, (jax.tree_util.keystr(pa), a.dtype, b.dtype)

    mixed = int8_exec_params(q, jnp.bfloat16, template=params)
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            mixed, is_leaf=is_quant)[0]:
        if is_quant(leaf):
            continue
        want = params
        for k in path:
            want = want[getattr(k, "key", getattr(k, "idx", None))]
        assert leaf.dtype == want.dtype, (jax.tree_util.keystr(path),
                                          leaf.dtype, want.dtype)


def test_int8_exec_forward_close_and_greedy_runs():
    """Full model forward with int8 pred+joint: logits near fp, decode runs."""
    cfg = tiny_config()
    model = Transducer(cfg)
    params = init_transducer_params(jax.random.PRNGKey(0), cfg)
    mixed = int8_exec_params(quantize_params(params), jnp.float32)

    B, T, U = 2, 12, 5
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.normal(size=(B, T, cfg.input_feat_size)), jnp.float32)
    pred_inp = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, U + 1)), jnp.int32)

    ref, _ = model.apply(params, mel, pred_inp)
    got, _ = model.apply(mixed, mel, pred_inp)
    ref, got = np.asarray(ref), np.asarray(got)
    # quantization noise must stay well under the logit spread
    assert np.max(np.abs(got - ref)) < 0.25 * np.std(ref)
    # and the decode path (jit, carried pred state, int8 joint steps) runs
    tokens, lengths = jax.jit(
        lambda p, m, sl: greedy_decode(model, p, m, sl, max_output_length=16)
    )(mixed, mel, jnp.full((B,), T, jnp.int32))
    assert tokens.shape == (B, 16)
    assert np.all(np.asarray(lengths) >= 0)


def test_int8_exec_dot_general_is_integer():
    """The int8 path really lowers to an int8 x int8 -> int32 dot."""
    w = _quant_leaf(np.random.default_rng(3).normal(size=(32, 16)).astype(np.float32))
    hlo = jax.jit(lambda x: qdot(x, w)).lower(
        jnp.ones((4, 32), jnp.float32)).as_text()
    assert "xi8>" in hlo, hlo  # int8 operands reach the dot
    assert "xi32>" in hlo      # int32 accumulation requested


def test_int8_exec_decode_matches_overfit_transcripts():
    """On a trained model the int8-exec greedy transcripts match dequant-bf16
    storage quantization (the measured-zero-delta path) — execution precision
    does not cost accuracy at this scale."""
    pytest.importorskip("jax")
    from tests.test_beam_stream_ckpt import overfit_audio_model

    cfg, state, tok, utts, loss = overfit_audio_model()
    assert loss < 0.5
    model = Transducer(cfg)
    q = quantize_params(state.params)
    deq = dequantize_params(q, jnp.float32)
    mixed = int8_exec_params(q, jnp.float32)

    from rnnt_tpu.ops import features as F

    def transcribe(params, audio):
        mel = np.asarray(F.preprocess_audio(jnp.asarray(audio, jnp.float32), cfg))
        mel_p = np.zeros((1, 128, mel.shape[1]), np.float32)
        mel_p[0, : mel.shape[0]] = mel
        t, l = greedy_decode(model, params, jnp.asarray(mel_p),
                             jnp.asarray([mel.shape[0]], jnp.int32),
                             max_output_length=64)
        return tok.decode(np.asarray(t[0])[: int(l[0])].tolist())

    deq_texts = [transcribe(deq, a) for a, _, _ in utts]
    int8_texts = [transcribe(mixed, a) for a, _, _ in utts]
    assert int8_texts == deq_texts


test_int8_exec_decode_matches_overfit_transcripts = pytest.mark.slow(
    test_int8_exec_decode_matches_overfit_transcripts)
