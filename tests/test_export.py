"""jax.export serving artifacts (rnnt_tpu/export.py) — the working
replacement for the reference's broken TFLite export (quantize_model.py,
SURVEY.md §2.5 quirk 1): serialize -> deserialize -> numerical parity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rnnt_tpu import export as ex
from rnnt_tpu.config import tiny_config
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.transducer import Transducer, init_transducer_params

CFG = tiny_config(
    vocab_size=16, encoder_layers=2, encoder_size=24, projection_size=16,
    pred_net_layers=1, pred_net_size=24, joint_size=16, embedding_size=8,
    mel_bins=6)


def _params():
    return init_transducer_params(jax.random.PRNGKey(0), CFG)


def test_transcribe_artifact_round_trip(tmp_path):
    params = _params()
    blob, meta = ex.export_transcribe(
        params, CFG, batch=2, frames=12, max_output_length=6,
        platforms=["cpu"])
    path = ex.save_artifact(str(tmp_path), "transcribe", blob, meta)
    exp = ex.load_artifact(path)

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 12, CFG.input_feat_size)),
                      jnp.float32)
    lens = jnp.asarray([12, 8], jnp.int32)
    got_t, got_l = exp.call(mel, lens)
    ref_t, ref_l = greedy_decode(Transducer(CFG), params, mel, lens,
                                 max_output_length=6)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))


@pytest.mark.slow
def test_streaming_artifact_matches_live_chunked_decode(tmp_path):
    """Chunk-by-chunk through the deserialized step == the live (in-process)
    chunked decode: serialization fidelity of tokens, encoder state, and
    decode carry across chunks.  (chunked == one-shot itself is covered by
    the streaming tests on an overfit model — it only holds when emission
    caps don't bind, which a random-init spam model violates.)"""
    from rnnt_tpu.decode.greedy import greedy_decode_encoded

    params = _params()
    model = Transducer(CFG)
    r = CFG.time_reduction_factor if CFG.time_reduction_index >= 0 else 1
    chunk = 2 * r
    T = 4 * chunk
    blob, meta = ex.export_streaming_step(
        params, CFG, chunk_frames=chunk, max_tokens_per_chunk=8,
        platforms=["cpu"])
    path = ex.save_artifact(str(tmp_path), "streaming_step", blob, meta)
    exp = ex.load_artifact(path)

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((T, CFG.input_feat_size)),
                      jnp.float32)

    def init():
        enc_state, pred_state = ex.streaming_init_state(CFG)
        pred_out, pred_state = model.predict_step(
            params, jnp.zeros((1,), jnp.int32), pred_state)
        return enc_state, (pred_out, pred_state)

    # exported artifact
    enc_state, carry = init()
    got = []
    for off in range(0, T, chunk):
        tokens, n, enc_state, carry = exp.call(
            mel[off: off + chunk], enc_state, carry)
        got.append(np.asarray(tokens)[: int(n)].tolist())

    # live chunked decode
    enc_state2, carry2 = init()
    ref = []
    for off in range(0, T, chunk):
        e, enc_state2 = model.encode(params, mel[None, off: off + chunk],
                                     state=enc_state2)
        toks, n, carry2 = greedy_decode_encoded(
            model, params, e, jnp.full((1,), e.shape[1], jnp.int32),
            max_output_length=8, carry=carry2)
        ref.append(np.asarray(toks)[0, : int(n[0])].tolist())

    assert got == ref
    # final states agree across the serialization boundary
    for a, b in zip(jax.tree_util.tree_leaves((enc_state, carry)),
                    jax.tree_util.tree_leaves((enc_state2, carry2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_unfrozen_params_artifact(tmp_path):
    params = _params()
    blob, meta = ex.export_transcribe(
        params, CFG, batch=1, frames=8, max_output_length=4,
        platforms=["cpu"], freeze_params=False)
    path = ex.save_artifact(str(tmp_path), "transcribe_unfrozen", blob, meta)
    exp = ex.load_artifact(path)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((1, 8, CFG.input_feat_size)),
                      jnp.float32)
    lens = jnp.asarray([8], jnp.int32)
    got_t, got_l = exp.call(params, mel, lens)
    ref_t, ref_l = greedy_decode(Transducer(CFG), params, mel, lens,
                                 max_output_length=4)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))
