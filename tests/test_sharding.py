"""Distributed-without-a-cluster: sharded-vs-single-device numerical parity
on the simulated 8-device CPU mesh (SURVEY.md §4 — the multi-device test story
the reference lacks; replaces trust in MirroredStrategy run_rnnt.py:119-122).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rnnt_tpu.config import tiny_config
from rnnt_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_sharding_rules)
from rnnt_tpu.train.state import create_train_state
from rnnt_tpu.train.steps import make_train_step

CFG = tiny_config(
    vocab_size=32, encoder_layers=2, encoder_size=32, projection_size=16,
    pred_net_size=32, joint_size=16, embedding_size=16, mel_bins=8)


def _batch(B=8, T=10, U=4):
    rng = np.random.default_rng(0)
    return {
        "mel_specs": jnp.asarray(
            rng.standard_normal((B, T, CFG.input_feat_size)), jnp.float32),
        "pred_inp": jnp.asarray(rng.integers(0, CFG.vocab_size, (B, U + 1)),
                                jnp.int32),
        "labels": jnp.asarray(rng.integers(1, CFG.vocab_size, (B, U)), jnp.int32),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }


def test_eight_devices_available():
    assert jax.device_count() == 8  # conftest.py forced host platform count


@pytest.mark.parametrize("data,model,impl", [
    pytest.param(8, 1, "ref", marks=pytest.mark.slow),
    pytest.param(4, 2, "ref", marks=pytest.mark.slow),
    (8, 1, "fused"),
    (4, 2, "fused"),
    pytest.param(8, 1, "banded", marks=pytest.mark.slow),
    pytest.param(4, 2, "banded", marks=pytest.mark.slow)])
def test_sharded_train_step_matches_single_device(data, model, impl):
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step_fn = make_train_step(CFG, loss_impl=impl, donate=False)
    batch = _batch()
    key = jax.random.PRNGKey(1)

    # single device
    s1, m1 = step_fn(state, batch, key)

    # sharded
    mesh = make_mesh(data=data, model=model)
    shardings = param_sharding_rules(mesh, state.params)
    params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    opt = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state)
    st = state._replace(
        params=params, opt_state=opt,
        step=jax.device_put(state.step, NamedSharding(mesh, P())))
    bsh = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    with jax.sharding.set_mesh(mesh):
        s2, m2 = step_fn(st, sharded_batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-5)
    # updated params agree
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_decode_matches_single_device(data, model):
    """Beam/greedy decode under a mesh: per-utterance beam state shards on
    the data axis (BASELINE.json config #3) and must be bit-identical to the
    single-device decode."""
    from rnnt_tpu.decode.beam import beam_search_decode
    from rnnt_tpu.decode.greedy import greedy_decode
    from rnnt_tpu.models.transducer import Transducer, init_transducer_params

    m = Transducer(CFG)
    params = init_transducer_params(jax.random.PRNGKey(3), CFG)
    batch = _batch()
    mel, sl = batch["mel_specs"], batch["spec_lengths"]

    gt, gl = greedy_decode(m, params, mel, sl, max_output_length=6)
    bt, bl, bs = beam_search_decode(m, params, mel, sl, beam_width=3,
                                    max_output_length=6)

    mesh = make_mesh(data=data, model=model)
    psh = param_sharding_rules(mesh, params)
    sp = jax.tree_util.tree_map(jax.device_put, params, psh)
    bsh = batch_sharding(mesh)
    mel_s, sl_s = jax.device_put(mel, bsh), jax.device_put(sl, bsh)
    with jax.sharding.set_mesh(mesh):
        gt2, gl2 = jax.jit(
            lambda p, x, l: greedy_decode(m, p, x, l, max_output_length=6)
        )(sp, mel_s, sl_s)
        bt2, bl2, bs2 = jax.jit(
            lambda p, x, l: beam_search_decode(
                m, p, x, l, beam_width=3, max_output_length=6)
        )(sp, mel_s, sl_s)

    np.testing.assert_array_equal(np.asarray(gt), np.asarray(gt2))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(gl2))
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(bt2))
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(bl2))
    np.testing.assert_allclose(np.asarray(bs), np.asarray(bs2),
                               rtol=1e-5, atol=1e-5)


class _FakeDev:
    def __init__(self, p):
        self.process_index = p


def _fake_mesh(row_procs):
    """Mesh stand-in: row_procs[r] = list of process ids owning row r's
    devices (data_read_group only reads .devices[...].process_index)."""
    class _M:
        devices = np.array(
            [[_FakeDev(p) for p in row] for row in row_procs], dtype=object)
    return _M()


def test_data_read_group_rejects_interleaved_rows():
    """Disjoint-but-interleaved row ownership ({0,2}/{1,3}) passes the
    overlap check but breaks eval's contiguous-block row pairing — must be
    a loud error, not silent hypothesis/reference mispairing (ADVICE r4)."""
    from rnnt_tpu.parallel.mesh import data_read_group

    with pytest.raises(ValueError, match="contiguous"):
        data_read_group(_fake_mesh([[0], [1], [0], [1]]))
    with pytest.raises(ValueError, match="unequal"):
        data_read_group(_fake_mesh([[0], [1], [1]]))
    # contiguous equal blocks: fine (2 groups; this process is group 0)
    assert data_read_group(_fake_mesh([[0], [0], [1], [1]])) == (0, 2)


def test_read_group_process_count():
    """Processes sharing a read group (model axis spanning hosts) must be
    down-weighted in eval stats; pure DP counts 1 (ADVICE r4)."""
    from rnnt_tpu.parallel.mesh import read_group_process_count

    # rows 0-1 owned by procs {0,1} jointly (TP spans them): count 2
    assert read_group_process_count(
        _fake_mesh([[0, 1], [0, 1], [2, 3], [2, 3]])) == 2
    # pure DP: each process its own rows
    assert read_group_process_count(_fake_mesh([[0], [1], [2], [3]])) == 1
    real = make_mesh(data=-1, model=1)
    assert read_group_process_count(real) == 1  # single-process CPU mesh


def test_param_sharding_rules_cover_model_axis():
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    shardings = param_sharding_rules(mesh, state.params)
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: str(s.spec), shardings))
    # at least the LSTM gate matrices and joint must be model-sharded
    assert any("model" in s for s in specs)


@pytest.mark.parametrize("impl", ["fused", pytest.param("banded", marks=pytest.mark.slow)])
def test_tp_fused_loss_no_w2_allgather(impl):
    """With model_parallel=2 the fused loss runs shard_mapped: the HLO must
    contain NO all-gather of the vocab-sharded [J, V] W2 (round-1 weakness:
    the opaque pallas_call forced GSPMD to gather 10 MB of W2 per step per
    device).  The only model-axis collectives are the three [B,T,U+1] plane
    reductions and the [.., J] dh psum."""
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    step_fn = make_train_step(CFG, loss_impl=impl, donate=False)
    batch = _batch()
    shardings = param_sharding_rules(mesh, state.params)
    params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    opt = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state)
    st = state._replace(
        params=params, opt_state=opt,
        step=jax.device_put(state.step, NamedSharding(mesh, P())))
    bsh = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    with jax.sharding.set_mesh(mesh):
        hlo = step_fn.lower(st, sharded_batch,
                            jax.random.PRNGKey(1)).compile().as_text()
    J, V = CFG.joint_size, CFG.vocab_size
    # any all-gather reconstructing the full [J, V] W2 (fp32 or bf16)
    import re as re_mod
    gathers = [l for l in hlo.splitlines() if "all-gather" in l]
    bad = [l for l in gathers if re_mod.search(
        rf"f32\[{J},{V}\]|bf16\[{J},{V}\]", l)]
    assert not bad, "full-W2 all-gather in TP HLO:\n" + "\n".join(bad)
