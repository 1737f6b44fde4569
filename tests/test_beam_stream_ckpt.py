"""Beam search, streaming transcriber, checkpoint resume, quantization."""

import os
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rnnt_tpu.config import tiny_config
from rnnt_tpu.data.tokenizer import CharTokenizer
from rnnt_tpu.decode.beam import beam_search_decode
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.decode.streaming import StreamingTranscriber
from rnnt_tpu.models.transducer import Transducer, init_transducer_params
from rnnt_tpu.ops.quantize import (
    dequantize_params, load_quantized, quantize_params, quantized_size_bytes,
    save_quantized)
from rnnt_tpu.train import checkpoint as ckpt_mod
from rnnt_tpu.train.state import create_train_state
from rnnt_tpu.train.steps import make_train_step

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)


CFG = tiny_config(
    vocab_size=8, encoder_layers=2, encoder_size=24, projection_size=16,
    pred_net_layers=1, pred_net_size=24, joint_size=16, embedding_size=8,
    mel_bins=6, max_symbols_per_frame=4, learning_rate=0.3,
    grad_clip_norm=1.0)


def _overfit_state(steps=200, tol=0.05):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step_fn = make_train_step(CFG, donate=False)
    B, T, U = 2, 8, 2
    rng = np.random.default_rng(5)
    labels = jnp.asarray([[3, 5], [6, 2]], jnp.int32)
    batch = {
        "mel_specs": jnp.asarray(
            rng.standard_normal((B, T, CFG.input_feat_size)), jnp.float32),
        "pred_inp": jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), labels], axis=1),
        "labels": labels,
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    key = jax.random.PRNGKey(2)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        # m["loss"] is evaluated at `state`'s params (pre-update); return the
        # params that achieved the low loss — one more momentum-heavy SGD
        # update at lr=0.3 can overshoot and wreck the overfit.
        new_state, m = step_fn(state, batch, sub)
        if float(m["loss"]) < tol:
            break
        state = new_state
    return state, batch, labels, float(m["loss"])


def test_beam_matches_labels_on_overfit_model():
    state, batch, labels, loss = _overfit_state()
    assert loss < 0.5, loss
    model = Transducer(CFG)
    tokens, lengths, scores = beam_search_decode(
        model, state.params, batch["mel_specs"], batch["spec_lengths"],
        beam_width=3, max_output_length=8)
    for i in range(labels.shape[0]):
        got = np.asarray(tokens)[i, : int(lengths[i])]
        np.testing.assert_array_equal(got, np.asarray(labels[i]))
    # scores sorted descending, best is finite log-prob <= 0
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-5)
    assert np.all(s[:, 0] <= 1e-3) and np.all(s[:, 0] > -50)

    # greedy agrees on an overfit model
    gtok, glen = greedy_decode(model, state.params, batch["mel_specs"],
                               batch["spec_lengths"], max_output_length=8)
    np.testing.assert_array_equal(np.asarray(glen), np.asarray(lengths))


def test_beam_all_blank_model_decodes_empty():
    model = Transducer(CFG)
    params = init_transducer_params(jax.random.PRNGKey(0), CFG)
    params["joint"]["b2"] = params["joint"]["b2"].at[0].set(100.0)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, CFG.input_feat_size))
    tokens, lengths, scores = beam_search_decode(
        model, params, mel, beam_width=2, max_output_length=8)
    np.testing.assert_array_equal(np.asarray(lengths), 0)


def test_streaming_transcriber_runs_and_resets():
    state, batch, labels, loss = _overfit_state()
    tok = CharTokenizer()
    cfg = CFG.replace(sample_rate=16000)
    st = StreamingTranscriber(cfg, state.params, tok)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    out1 = ""
    for off in range(0, len(audio), 1600):
        out1 = st.process_chunk(audio[off: off + 1600])
    assert isinstance(out1, str)
    st.reset()
    assert st.text == ""
    out2 = ""
    for off in range(0, len(audio), 1600):
        out2 = st.process_chunk(audio[off: off + 1600])
    assert out2 == out1  # deterministic across resets


def test_checkpoint_roundtrip(tmp_path):
    state, batch, labels, _ = _overfit_state(steps=3, tol=-1)
    path = ckpt_mod.save_checkpoint(str(tmp_path), state, CFG)
    assert os.path.isdir(path)
    cfg2 = ckpt_mod.load_config(str(tmp_path))
    assert cfg2 == CFG
    restored = ckpt_mod.restore_checkpoint(str(tmp_path), cfg2)
    assert int(np.asarray(restored.step)) == int(np.asarray(state.step))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training continues identically (optimizer state preserved)
    step_fn = make_train_step(CFG, donate=False)
    key = jax.random.PRNGKey(9)
    s1, m1 = step_fn(state, batch, key)
    s2, m2 = step_fn(restored, batch, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_checkpoint_pruning(tmp_path):
    state, _, _, _ = _overfit_state(steps=1, tol=-1)
    for step in range(1, 9):
        state = state._replace(step=jnp.asarray(step, jnp.int32))
        ckpt_mod.save_checkpoint(str(tmp_path), state, CFG, keep=3)
    steps = ckpt_mod.list_checkpoint_steps(str(tmp_path))
    assert steps == [6, 7, 8]
    assert ckpt_mod.latest_checkpoint(str(tmp_path)).endswith("checkpoint_00000008")


def test_quantize_roundtrip(tmp_path):
    params = init_transducer_params(jax.random.PRNGKey(0), CFG)
    q = quantize_params(params)
    fp_bytes = sum(np.asarray(x).nbytes
                   for x in jax.tree_util.tree_leaves(params))
    assert quantized_size_bytes(q) < fp_bytes / 2.5
    deq = dequantize_params(q, jnp.float32)
    # int8 per-channel error bound: |w - deq| <= scale/2 <= max|w|/254
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(deq)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) <= max(np.max(np.abs(a)) / 127, 1e-6)

    path = str(tmp_path / "q.npz")
    save_quantized(path, q)
    q2 = load_quantized(path, params)
    is_q = lambda x: isinstance(x, dict) and set(x) == {"q", "s"}
    for a, b in zip(jax.tree_util.tree_leaves(q, is_leaf=is_q),
                    jax.tree_util.tree_leaves(q2, is_leaf=is_q)):
        if isinstance(a, dict):
            np.testing.assert_array_equal(a["q"], b["q"])
            np.testing.assert_array_equal(a["s"], b["s"])
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_decode_matches_fp_on_overfit_model():
    """int8 weight quantization must not change decode on a confident model
    (the WER-delta check, BASELINE.md int8 metric, in miniature)."""
    state, batch, labels, loss = _overfit_state()
    assert loss < 0.5
    model = Transducer(CFG)
    deq = dequantize_params(quantize_params(state.params), jnp.float32)
    tokens, lengths = greedy_decode(model, deq, batch["mel_specs"],
                                    batch["spec_lengths"], max_output_length=8)
    for i in range(labels.shape[0]):
        got = np.asarray(tokens)[i, : int(lengths[i])]
        np.testing.assert_array_equal(got, np.asarray(labels[i]))


def test_checkpoint_orbax_backend(tmp_path):
    state, batch, labels, _ = _overfit_state(steps=2, tol=-1)
    path = ckpt_mod.save_checkpoint(str(tmp_path), state, CFG, backend="orbax")
    for src in (path, str(tmp_path)):  # explicit path AND run-dir discovery
        restored = ckpt_mod.restore_checkpoint(src, CFG)
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_causal_mean_converges_to_offline_features():
    """The streaming causal running-mean normalization must converge to the
    offline whole-utterance mean: the LAST chunk's fed features (cumulative
    mean == full mean by then) must match the offline frontend exactly."""
    from rnnt_tpu.ops import features as F

    cfg = CFG.replace(sample_rate=16000)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    state, _, _, _ = _overfit_state(steps=1, tol=-1)
    tok = CharTokenizer()
    st = StreamingTranscriber(cfg, state.params, tok)

    fed = []
    orig_run = st._run

    def spy(params, mel, enc_state, carry, n_valid):
        fed.append(np.asarray(mel))
        return orig_run(params, mel, enc_state, carry, n_valid)

    st._run = spy
    for off in range(0, len(audio), 1600):
        st.process_chunk(audio[off: off + 1600])

    offline = np.asarray(F.preprocess_audio(jnp.asarray(audio), cfg))
    streamed = np.concatenate(fed, 0)
    # same frame count modulo the held-back tail
    assert abs(len(offline) - len(streamed)) <= cfg.time_reduction_factor
    n = min(len(offline), len(streamed))
    # the final fed rows used the complete cumulative mean == offline mean
    np.testing.assert_allclose(streamed[n - 2: n], offline[n - 2: n],
                               rtol=1e-4, atol=1e-4)
    # early rows are causally normalized: close in scale, not exact
    assert np.max(np.abs(streamed[:n] - offline[:n])) < 1.0


def test_streaming_flush_drains_tail():
    """flush() must feed the held-back tail (sample/frame/stack remainders)
    so the stream decodes at least as many frames as the offline frontend."""
    from rnnt_tpu.ops import features as F

    cfg = CFG.replace(sample_rate=16000)
    rng = np.random.default_rng(5)
    # deliberately awkward length: leaves sample+frame+stack remainders
    audio = (rng.standard_normal(16000 + 777) * 0.1).astype(np.float32)

    state, _, _, _ = _overfit_state(steps=1, tol=-1)
    st = StreamingTranscriber(cfg, state.params, CharTokenizer())
    fed = []
    orig = st._run

    def spy(params, mel, enc_state, carry, n_valid):
        fed.append(np.asarray(mel))
        return orig(params, mel, enc_state, carry, n_valid)

    st._run = spy
    for off in range(0, len(audio), 1600):
        st.process_chunk(audio[off: off + 1600])
    n_before = sum(len(f) for f in fed)
    text = st.flush()
    assert isinstance(text, str)
    n_after = sum(len(f) for f in fed)
    offline = len(np.asarray(F.preprocess_audio(jnp.asarray(audio), cfg)))
    assert n_before < offline  # tail really was held back
    assert n_after >= offline  # flush drained it (plus silence padding)

    # the flush's zero padding must NOT extend the decoded region: the
    # valid-frame bound covers the real audio and nothing of the pad
    # (prevents the trailing-token hallucination measured on-chip —
    # streamed WER 0.1088 -> 0.0269 after this bound)
    r = cfg.time_reduction_factor if cfg.time_reduction_index >= 0 else 1
    stacked_real = -(-(-(-len(audio) // cfg.frame_step_samples))
                     // cfg.downsample_factor)
    assert st._valid_enc_frames() == -(-stacked_real // r)
    # pad frames beyond the bound were fed but excluded from decode
    assert st._enc_done > st._valid_enc_frames()
    # real-sample accounting ignores filler (prime re-feeds, flush pad)
    assert st._real_samples == len(audio)

    # flush is TERMINAL: more real audio would lag n_valid forever (the pad
    # frames above advanced _enc_done past the real bound) and decode
    # against zero-polluted LSTM state — reject it loudly (ADVICE r4)
    with pytest.raises(RuntimeError, match="flush"):
        st.process_chunk(audio[:1600])
    st.reset()  # a new utterance starts clean
    assert st.process_chunk(audio[:1600]) == ""


def _tone_utterances():
    """Tiny compositional audio corpus: each word is a tone sequence."""
    sr = 16000
    tones = {"ab": 500.0, "ca": 1100.0, "bc": 2300.0}

    def word_audio(w):
        n = int(0.25 * sr)
        t = np.arange(n) / sr
        env = np.ones(n)
        fade = int(0.02 * sr)
        env[:fade] = np.linspace(0, 1, fade)
        env[-fade:] = np.linspace(1, 0, fade)
        return (0.4 * np.sin(2 * np.pi * tones[w] * t) * env).astype(np.float32)

    gap = np.zeros(int(0.06 * sr), np.float32)
    utts = []
    for words in (["ab", "ca"], ["bc", "ab"], ["ca", "bc"], ["ab", "bc"]):
        parts = [gap]
        for w in words:
            parts += [word_audio(w), gap]
        utts.append((np.concatenate(parts), sr, " ".join(words)))
    return utts


def overfit_audio_model(max_steps=600, tol=0.05):
    """Train the tiny model on audio-derived features of the tone corpus
    until it transcribes it back; returns (cfg, state, tok, utts, loss).
    Shared by the streaming-WER and serving tests."""
    from rnnt_tpu.ops import features as F

    tok = CharTokenizer()
    cfg = CFG.replace(vocab_size=tok.vocab_size, mel_bins=8,
                      encoder_size=32, pred_net_size=32, learning_rate=0.05)
    utts = _tone_utterances()
    mels = [np.asarray(F.preprocess_audio(jnp.asarray(a), cfg))
            for a, _, _ in utts]
    labels = [tok.encode(txt) for _, _, txt in utts]
    T = max(m.shape[0] for m in mels)
    U = max(len(l) for l in labels)
    B = len(utts)
    mel_b = np.zeros((B, T, cfg.input_feat_size), np.float32)
    lab_b = np.zeros((B, U), np.int32)
    sl = np.zeros((B,), np.int32)
    ll = np.zeros((B,), np.int32)
    for i, (m, l) in enumerate(zip(mels, labels)):
        mel_b[i, : m.shape[0]] = m
        lab_b[i, : len(l)] = l
        sl[i], ll[i] = m.shape[0], len(l)
    batch = {
        "mel_specs": jnp.asarray(mel_b),
        "pred_inp": jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.asarray(lab_b)], axis=1),
        "labels": jnp.asarray(lab_b),
        "spec_lengths": jnp.asarray(sl),
        "label_lengths": jnp.asarray(ll),
    }
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg, donate=False)
    key = jax.random.PRNGKey(2)
    loss = float("inf")
    for _ in range(max_steps):
        key, sub = jax.random.split(key)
        new_state, m = step_fn(state, batch, sub)
        loss = float(m["loss"])
        if loss < tol:
            break
        state = new_state
    return cfg, state, tok, utts, loss


def test_streamed_wer_close_to_offline_on_overfit_audio_model():
    """Streaming quality over a SET of utterances, not one anecdote: a model
    overfit on audio-derived features must transcribe the same audio nearly
    as well chunk-streamed (causal running-mean normalization, carried LSTM
    state) as offline.  Pins the streamed-vs-offline WER delta the causal
    feature statistics cost (BASELINE.md records the parity-scale number)."""
    from rnnt_tpu.decode.streaming import streamed_vs_offline

    cfg, state, tok, utts, loss = overfit_audio_model()
    assert loss < 0.5, loss  # must actually learn the audio->text mapping

    off_wer, str_wer, details = streamed_vs_offline(
        cfg, state.params, tok, utts, chunk_samples=1024)
    assert off_wer <= 0.25, details   # offline decode reads back the corpus
    # streaming's causal feature statistics may cost a little quality but
    # must stay close (the parity-scale delta lands in BASELINE.md)
    assert str_wer - off_wer <= 0.25, details
