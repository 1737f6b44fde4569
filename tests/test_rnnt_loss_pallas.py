"""Pallas lattice kernel vs the pure-JAX reference (interpret mode on CPU;
the same kernel compiles for real on TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rnnt_tpu.ops.rnnt_loss_ref as ref
from rnnt_tpu.ops.rnnt_loss_pallas import lattice_scan_pallas, rnnt_loss_pallas

pytestmark = pytest.mark.slow  # interpret-mode Pallas / CLI E2E — deselected by default (see pyproject)



def _case(seed, B, T, U, V, vary=True):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    if vary:
        fl = rng.integers(max(1, T // 2), T + 1, size=(B,)).astype(np.int32)
        yl = rng.integers(0, U + 1, size=(B,)).astype(np.int32)
    else:
        fl = np.full((B,), T, np.int32)
        yl = np.full((B,), U, np.int32)
    return (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl),
            jnp.asarray(yl))


@pytest.mark.parametrize("B,T,U,V", [(2, 6, 3, 8), (3, 12, 7, 16), (9, 5, 2, 6)])
def test_lattice_scan_matches_ref(B, T, U, V):
    logits, labels, fl, yl = _case(B * 100 + T, B, T, U, V)
    logits32 = logits.astype(jnp.float32)
    denom, b, e = ref._gather_coeffs(logits32, labels, yl)
    alpha_r = ref._alpha_scan(b, e)
    beta_r = ref._beta_scan(b, e, fl, yl)
    alpha_p, beta_p, ll_p = lattice_scan_pallas(b, e, fl, yl, interpret=True)

    # compare only the valid region (padding garbage may differ)
    for i in range(B):
        Tb, Ub = int(fl[i]), int(yl[i])
        np.testing.assert_allclose(
            np.asarray(alpha_p)[i, :Tb, :Ub + 1],
            np.asarray(alpha_r)[i, :Tb, :Ub + 1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(beta_p)[i, :Tb, :Ub + 1],
            np.asarray(beta_r)[i, :Tb, :Ub + 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(beta_r[:, 0, 0]),
                               rtol=1e-5, atol=1e-5)


def test_loss_and_grad_match_ref():
    logits, labels, fl, yl = _case(7, 3, 10, 5, 12)
    loss_r = ref.rnnt_loss_ref(logits, labels, fl, yl)
    loss_p = rnnt_loss_pallas(logits, labels, fl, yl, interpret=True)
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_r),
                               rtol=1e-5, atol=1e-5)

    g_r = jax.grad(lambda x: jnp.sum(ref.rnnt_loss_ref(x, labels, fl, yl)))(logits)
    g_p = jax.grad(lambda x: jnp.sum(rnnt_loss_pallas(
        x, labels, fl, yl, interpret=True)))(logits)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=1e-4, atol=1e-5)


def test_loss_vs_numpy_oracle():
    logits, labels, fl, yl = _case(11, 4, 8, 4, 7)
    loss_p = rnnt_loss_pallas(logits, labels, fl, yl, interpret=True)
    expected = ref.rnnt_loss_numpy(
        np.asarray(logits), np.asarray(labels), np.asarray(fl), np.asarray(yl))
    np.testing.assert_allclose(np.asarray(loss_p), expected, rtol=1e-4,
                               atol=1e-4)
