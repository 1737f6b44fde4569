"""Greedy decoding: blank behaviour, streaming-chunk equivalence, overfit E2E."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.decode.greedy import greedy_decode, greedy_decode_encoded
from rnnt_tpu.models.transducer import Transducer, init_transducer_params
from rnnt_tpu.train.state import create_train_state
from rnnt_tpu.train.steps import make_train_step

CFG = tiny_config(
    vocab_size=8, encoder_layers=2, encoder_size=24, projection_size=16,
    pred_net_layers=1, pred_net_size=24, joint_size=16, embedding_size=8,
    mel_bins=6, max_symbols_per_frame=4)


def _params(key=0):
    return init_transducer_params(jax.random.PRNGKey(key), CFG)


def test_all_blank_decodes_empty():
    model = Transducer(CFG)
    params = _params()
    # rig the joint final bias to overwhelmingly prefer blank (id 0)
    params["joint"]["b2"] = params["joint"]["b2"].at[0].set(100.0)
    mel = jax.random.normal(jax.random.PRNGKey(1), (3, 8, CFG.input_feat_size))
    tokens, lengths = greedy_decode(model, params, mel,
                                    max_output_length=16)
    assert tokens.shape == (3, 16)
    np.testing.assert_array_equal(np.asarray(lengths), 0)


def test_max_symbols_bound_respected():
    model = Transducer(CFG)
    params = _params()
    # rig bias so blank is never the argmax -> emits max_symbols per frame
    params["joint"]["b2"] = params["joint"]["b2"].at[0].set(-100.0)
    T = 5
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, T, CFG.input_feat_size))
    tokens, lengths = greedy_decode(model, params, mel, max_output_length=64)
    # encoder reduces T=5 -> 3 frames; cap = 3 * max_symbols_per_frame
    np.testing.assert_array_equal(np.asarray(lengths),
                                  3 * CFG.max_symbols_per_frame)
    assert np.all(np.asarray(tokens[:, :12]) != 0)


def test_streaming_chunked_equals_full():
    """Chunked encode+decode with carried state == one-shot decode
    (the streaming_transcribe.py stateful contract)."""
    model = Transducer(CFG)
    params = _params(2)
    B, T = 2, 12
    mel = jax.random.normal(jax.random.PRNGKey(3), (B, T, CFG.input_feat_size))

    # one-shot
    tokens_full, len_full = greedy_decode(model, params, mel,
                                          max_output_length=32)

    # two chunks of 6 (even -> aligned with time_reduction_factor 2)
    enc_state = None
    carry = None
    toks = []
    for chunk in (mel[:, :6], mel[:, 6:]):
        encoded, enc_state = model.encode(params, chunk, state=enc_state)
        enc_len = jnp.full((B,), encoded.shape[1], jnp.int32)
        t, l, carry = greedy_decode_encoded(
            model, params, encoded, enc_len, max_output_length=16, carry=carry)
        for i in range(B):
            toks.append((i, np.asarray(t[i, :int(l[i])])))
    # reassemble per batch element
    per_b = {i: np.concatenate([tt for j, tt in toks if j == i]) for i in range(B)}
    for i in range(B):
        full_i = np.asarray(tokens_full[i, :int(len_full[i])])
        np.testing.assert_array_equal(per_b[i], full_i)


@pytest.mark.slow
def test_overfit_decode_roundtrip():
    """Train to overfit one tiny batch; greedy decode must reproduce the
    training transcripts (SURVEY.md §4 integration test)."""
    cfg = CFG.replace(learning_rate=0.3, grad_clip_norm=1.0, dropout=0.0)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, donate=False)
    B, T, U = 2, 8, 2
    rng = np.random.default_rng(5)
    labels = jnp.asarray([[3, 5], [6, 2]], jnp.int32)
    batch = {
        "mel_specs": jnp.asarray(
            rng.standard_normal((B, T, cfg.input_feat_size)), jnp.float32),
        "pred_inp": jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), labels], axis=1),
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    key = jax.random.PRNGKey(2)
    loss = None
    for i in range(150):
        key, sub = jax.random.split(key)
        # m["loss"] is the pre-update loss; keep the params that achieved it
        # (one extra momentum-heavy update can overshoot the overfit).
        new_state, m = step_fn(state, batch, sub)
        loss = float(m["loss"])
        if loss < 0.05:
            break
        state = new_state
    assert loss is not None and loss < 1.0, f"did not overfit: loss={loss}"

    model = Transducer(cfg)
    tokens, lengths = greedy_decode(
        model, state.params, batch["mel_specs"], batch["spec_lengths"],
        max_output_length=8)
    if loss < 0.05:
        for i in range(B):
            got = np.asarray(tokens[i, :int(lengths[i])])
            np.testing.assert_array_equal(got, np.asarray(labels[i]))


@pytest.mark.slow
def test_transcribe_file_cli_multi(tmp_path):
    """End-to-end CLI: checkpoint + WAVs -> batched transcripts (single file
    keeps the reference's bare-text stdout contract; multi prints path\\ttext)."""
    import io
    import contextlib

    from rnnt_tpu.cli import transcribe_file as cli
    from rnnt_tpu.data.audio_io import write_wav
    from rnnt_tpu.data.tokenizer import CharTokenizer
    from rnnt_tpu.train import checkpoint as ckpt_mod
    from rnnt_tpu.train.state import create_train_state

    cfg = CFG.replace(sample_rate=16000, token_type="character",
                      vocab_size=CharTokenizer().vocab_size)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    ckpt_mod.save_checkpoint(str(tmp_path), state, cfg)

    rng = np.random.default_rng(0)
    wavs = []
    for i, n in enumerate((8000, 16000)):  # different lengths -> one batch
        w = str(tmp_path / f"a{i}.wav")
        write_wav(w, (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)
        wavs.append(w)

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        cli.main(["--checkpoint", str(tmp_path), "-i"] + wavs)
    lines = [l for l in out.getvalue().splitlines()]
    assert len(lines) == 2 and all("\t" in l for l in lines)
    assert lines[0].startswith(wavs[0]) and lines[1].startswith(wavs[1])

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        cli.main(["--checkpoint", str(tmp_path), "-i", wavs[0]])
    assert "\t" not in out.getvalue()  # bare text for a single file
