"""RNN-T loss correctness: hand lattices, NumPy DP oracle, analytic gradients.

Replaces warp-transducer's test_cpu/test_gpu parity tests
(cmake/warp-rnnt-cmakelist.txt:108-126) with a real pytest pyramid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_ref, rnnt_loss_numpy


def _rand_case(rng, B, T, U, V, vary_lengths=True):
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32) * 2.0
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    if vary_lengths and T > 1 and U > 0:
        fl = rng.integers(max(1, T // 2), T + 1, size=(B,)).astype(np.int32)
        yl = rng.integers(0, U + 1, size=(B,)).astype(np.int32)
        # need at least U_b + 1 frames to emit U_b labels + final blank? No:
        # RNN-T allows multiple emissions per frame, so any T_b >= 1 works.
    else:
        fl = np.full((B,), T, np.int32)
        yl = np.full((B,), U, np.int32)
    return logits, labels, fl, yl


def brute_force_loss(logits, labels, T, U):
    """Enumerate every monotonic alignment path explicitly (tiny lattices)."""
    # numpy float64 log-softmax: jax would silently truncate to float32
    # without the x64 flag (and warn), defeating the high-precision oracle
    x = np.asarray(logits, np.float64)
    mx = x.max(-1, keepdims=True)
    lp = x - mx - np.log(np.exp(x - mx).sum(-1, keepdims=True))
    paths = []

    def walk(t, u, acc):
        if t == T - 1 and u == U:
            paths.append(acc + lp[t, u, 0])
            return
        if t < T - 1:
            walk(t + 1, u, acc + lp[t, u, 0])
        if u < U:
            walk(t, u + 1, acc + lp[t, u, labels[u]])

    walk(0, 0, 0.0)
    m = max(paths)
    return -(m + np.log(sum(np.exp(p - m) for p in paths)))


def test_single_path_tiny():
    # T=1, U=1: exactly one path: emit label then blank, both at t=0.
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 1, 2, 4)).astype(np.float32)
    labels = np.array([[2]], np.int32)
    loss = rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels), jnp.array([1]), jnp.array([1])
    )
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    expected = -(lp[0, 0, 0, 2] + lp[0, 0, 1, 0])
    np.testing.assert_allclose(np.asarray(loss)[0], float(expected), rtol=1e-5)


def test_blank_only():
    # U=0: the only path is T blanks.
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 4, 1, 5)).astype(np.float32)
    labels = np.zeros((1, 0), np.int32)
    loss = rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels), jnp.array([4]), jnp.array([0])
    )
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    expected = -float(lp[0, :, 0, 0].sum())
    np.testing.assert_allclose(np.asarray(loss)[0], expected, rtol=1e-5)


@pytest.mark.parametrize("T,U,V", [
    (2, 1, 3),
    pytest.param(3, 2, 4, marks=pytest.mark.slow),
    pytest.param(4, 3, 5, marks=pytest.mark.slow),
    pytest.param(5, 2, 6, marks=pytest.mark.slow)])
def test_brute_force_enumeration(T, U, V):
    rng = np.random.default_rng(T * 100 + U * 10 + V)
    logits = rng.standard_normal((1, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(1, U)).astype(np.int32)
    loss = rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.array([T], jnp.int32), jnp.array([U], jnp.int32),
    )
    expected = brute_force_loss(logits[0], labels[0], T, U)
    np.testing.assert_allclose(np.asarray(loss)[0], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,T,U,V", [
    (3, 8, 5, 11),
    pytest.param(4, 12, 7, 6, marks=pytest.mark.slow),
    pytest.param(2, 20, 10, 32, marks=pytest.mark.slow)])
def test_vs_numpy_dp(B, T, U, V):
    rng = np.random.default_rng(B * 1000 + T)
    logits, labels, fl, yl = _rand_case(rng, B, T, U, V)
    loss = rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl)
    )
    expected = rnnt_loss_numpy(logits, labels, fl, yl)
    np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_padding_invariance():
    """Extra padded frames/labels beyond the lengths must not change the loss."""
    rng = np.random.default_rng(7)
    B, T, U, V = 2, 6, 3, 8
    logits, labels, _, _ = _rand_case(rng, B, T, U, V, vary_lengths=False)
    fl = np.array([T, T - 2], np.int32)
    yl = np.array([U, U - 1], np.int32)
    base = np.asarray(rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl)))

    # grow padding with garbage
    pad_logits = np.concatenate(
        [logits, 13.0 * rng.standard_normal((B, 3, U + 1, V)).astype(np.float32)], axis=1)
    pad_logits = np.concatenate(
        [pad_logits, 7.0 * rng.standard_normal((B, T + 3, 2, V)).astype(np.float32)], axis=2)
    pad_labels = np.concatenate([labels, rng.integers(1, V, (B, 2)).astype(np.int32)], 1)
    padded = np.asarray(rnnt_loss_ref(
        jnp.asarray(pad_logits), jnp.asarray(pad_labels), jnp.asarray(fl), jnp.asarray(yl)))
    np.testing.assert_allclose(base, padded, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_gradient_vs_autodiff():
    """The analytic custom_vjp gradient == differentiating through the scans.

    (Finite differences are too noisy in fp32; autodiff of the non-custom-vjp
    forward is the exact same function, so this checks the alpha/beta
    occupancy formula directly.)
    """
    from rnnt_tpu.ops.rnnt_loss_ref import _forward

    rng = np.random.default_rng(3)
    B, T, U, V = 2, 4, 3, 5
    logits, labels, fl, yl = _rand_case(rng, B, T, U, V, vary_lengths=False)
    fl = np.array([T, T - 1], np.int32)
    yl = np.array([U, U - 1], np.int32)
    args = (jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl))

    g_custom = jax.grad(
        lambda x: jnp.sum(rnnt_loss_ref(x, *args)))(jnp.asarray(logits))
    g_auto = jax.grad(
        lambda x: jnp.sum(_forward(x, *args)[0]))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-3, atol=1e-4)

    # two loose finite-difference spot checks
    def f(x):
        return float(jnp.sum(rnnt_loss_ref(jnp.asarray(x), *args)))

    eps = 1e-2
    g = np.asarray(g_custom)
    for (b, t, u, v) in [(0, 1, 1, 2), (1, 0, 0, 0)]:
        d = np.zeros_like(logits)
        d[b, t, u, v] = eps
        num = (f(logits + d) - f(logits - d)) / (2 * eps)
        np.testing.assert_allclose(g[b, t, u, v], num, rtol=0.1, atol=5e-3)


def test_gradient_zero_outside_valid_region():
    rng = np.random.default_rng(9)
    B, T, U, V = 2, 5, 3, 6
    logits, labels, _, _ = _rand_case(rng, B, T, U, V, vary_lengths=False)
    fl = np.array([3, 5], np.int32)
    yl = np.array([2, 1], np.int32)

    def f(x):
        return jnp.sum(rnnt_loss_ref(
            x, jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl)))

    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert np.all(g[0, 3:] == 0)  # beyond T_b
    assert np.all(g[0, :, 3:] == 0)  # beyond U_b+1 rows
    assert np.all(g[1, :, 2:] == 0)
    # gradient sums to ~0 per valid (t,u) cell in expectation? Not generally;
    # but total blank+emit occupancy equals softmax*occ sum -> row sums to 0.
    np.testing.assert_allclose(g[0, :3, :3].sum(-1), 0.0, atol=1e-4)


@pytest.mark.slow
def test_bfloat16_logits():
    rng = np.random.default_rng(11)
    B, T, U, V = 2, 6, 4, 8
    logits, labels, fl, yl = _rand_case(rng, B, T, U, V, vary_lengths=False)
    l32 = np.asarray(rnnt_loss_ref(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl)))
    lbf = np.asarray(rnnt_loss_ref(
        jnp.asarray(logits, jnp.bfloat16), jnp.asarray(labels),
        jnp.asarray(fl), jnp.asarray(yl)))
    np.testing.assert_allclose(l32, lbf, rtol=0.05, atol=0.05)


def test_jit_and_grad_compile():
    rng = np.random.default_rng(13)
    B, T, U, V = 2, 10, 6, 16
    logits, labels, fl, yl = _rand_case(rng, B, T, U, V)
    fn = jax.jit(lambda x, y, a, b: jnp.mean(rnnt_loss_ref(x, y, a, b)))
    gfn = jax.jit(jax.grad(lambda x, y, a, b: jnp.mean(rnnt_loss_ref(x, y, a, b))))
    v = fn(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl))
    g = gfn(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(yl))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
