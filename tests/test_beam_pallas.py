"""Pallas beam-search kernel parity vs the XLA reference search.

The kernel (ops/beam_pallas.py) implements the single-expansion "modified"
transducer beam search, so parity is against decode/beam.py's
beam_search_encoded with expansions_per_frame=1 and an un-pruned vocab.
Runs in interpret mode on the CPU test mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.config import tiny_config
from rnnt_tpu.decode.beam import beam_search_encoded
from rnnt_tpu.models.transducer import Transducer, init_transducer_params
from rnnt_tpu.ops.beam_pallas import beam_search_encoded_pallas

from tests.test_beam_stream_ckpt import CFG, _overfit_state

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)



def _parity(model, params, enc, enc_lens, K, L, V, E=1, merge=True):
    # Both backends implement the SAME incremental duplicate-prefix merge
    # (merge_duplicates=True default), so full-beam scores must agree in
    # either mode.
    tok_x, len_x, sc_x = beam_search_encoded(
        model, params, enc, enc_lens, beam_width=K, max_output_length=L,
        expansions_per_frame=E, prune_vocab=V - 1, merge_duplicates=merge)
    tok_p, len_p, sc_p = beam_search_encoded_pallas(
        model, params, enc, enc_lens, beam_width=K, max_output_length=L,
        expansions_per_frame=E, merge_duplicates=merge)
    B = enc.shape[0]
    for b in range(B):
        lx, lp = int(len_x[b]), int(len_p[b])
        assert lx == lp, (b, lx, lp)
        np.testing.assert_array_equal(
            np.asarray(tok_x[b, :lx]), np.asarray(tok_p[b, :lp]))
    np.testing.assert_allclose(
        np.asarray(sc_x), np.asarray(sc_p), rtol=1e-4, atol=1e-4)
    return len_x


@pytest.mark.parametrize("beam_width,expansions,merge", [
    (2, 1, True), (4, 1, True), (3, 3, True), (4, 1, False), (3, 3, False)])
def test_overfit_parity_emitting(beam_width, expansions, merge):
    state, batch, labels, loss = _overfit_state()
    assert loss < 0.5, loss
    model = Transducer(CFG)
    enc, _ = model.encode(state.params, batch["mel_specs"])
    enc_lens = model.encoded_length(batch["spec_lengths"])
    lens = _parity(model, state.params, enc, enc_lens,
                   beam_width, 8, CFG.vocab_size, E=expansions, merge=merge)
    assert int(jnp.sum(lens)) > 0  # the overfit model really emits


def test_single_utterance_b1():
    """B=1 at K=4 (the serving shape): the flat hypothesis dim N=Bt*K must
    be padded up to a full sublane tile (round-4 Mosaic compile failure at
    N=4), and the pad utterance must not perturb the real one's beam."""
    state, batch, labels, loss = _overfit_state()
    model = Transducer(CFG)
    enc, _ = model.encode(state.params, batch["mel_specs"])
    enc_lens = model.encoded_length(batch["spec_lengths"])
    # full-batch result as the oracle for the sliced single utterance
    tok_f, len_f, sc_f = beam_search_encoded_pallas(
        model, state.params, enc, enc_lens, beam_width=4, max_output_length=8)
    tok_1, len_1, sc_1 = beam_search_encoded_pallas(
        model, state.params, enc[:1], enc_lens[:1], beam_width=4,
        max_output_length=8)
    assert tok_1.shape[0] == 1 and len_1.shape[0] == 1 and sc_1.shape[0] == 1
    assert int(len_1[0]) == int(len_f[0])
    np.testing.assert_array_equal(np.asarray(tok_1[0, :int(len_1[0])]),
                                  np.asarray(tok_f[0, :int(len_f[0])]))
    np.testing.assert_allclose(np.asarray(sc_1[0]), np.asarray(sc_f[0]),
                               rtol=1e-4, atol=1e-4)


def test_random_model_ragged_lengths():
    cfg = tiny_config(vocab_size=24, encoder_layers=2, encoder_size=16,
                      projection_size=8, pred_net_layers=2, pred_net_size=16,
                      joint_size=8, embedding_size=8, mel_bins=4)
    model = Transducer(cfg)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg)
    B, T, P = 5, 9, cfg.projection_size
    enc = jax.random.normal(jax.random.PRNGKey(7), (B, T, P)) * 2.0
    enc_lens = jnp.asarray([9, 4, 1, 9, 6], jnp.int32)
    _parity(model, params, enc, enc_lens, 3, 6, cfg.vocab_size)


def test_all_blank_model_decodes_empty():
    model = Transducer(CFG)
    params = init_transducer_params(jax.random.PRNGKey(0), CFG)
    params["joint"]["b2"] = params["joint"]["b2"].at[0].set(100.0)
    enc = jax.random.normal(
        jax.random.PRNGKey(1), (2, 8, CFG.projection_size))
    lens = jnp.full((2,), 8, jnp.int32)
    _, len_p, _ = beam_search_encoded_pallas(
        model, params, enc, lens, beam_width=2, max_output_length=8)
    np.testing.assert_array_equal(np.asarray(len_p), 0)


def test_length_cap_parity_on_emitting_model():
    # cap below the overfit transcript length: both searches must truncate
    # identically (the cap masks label expansions, blanks still settle)
    state, batch, labels, loss = _overfit_state()
    model = Transducer(CFG)
    enc, _ = model.encode(state.params, batch["mel_specs"])
    enc_lens = model.encoded_length(batch["spec_lengths"])
    lens = _parity(model, state.params, enc, enc_lens, 2, 1, CFG.vocab_size)
    np.testing.assert_array_equal(np.asarray(lens), 1)
