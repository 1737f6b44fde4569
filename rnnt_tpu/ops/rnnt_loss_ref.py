"""RNN-Transducer loss — pure-JAX reference implementation.

TPU-native replacement for the reference's native warp-transducer dependency
(ref: utils/loss.py:12-38, cmake/warp-rnnt-cmakelist.txt:99,119 — CUDA/OpenMP
forward-backward over the T×U lattice).  One convention everywhere (fixing ref
quirk loss.py:29-30): the op takes RAW logits and owns its log-softmax.

Design (TPU-first, not a port):
- The alpha/beta recursions are *linear recurrences in the log semiring* along
  the label axis:  x[u] = logaddexp(c[u], w[u] + x[u-1]).  Each time row is
  therefore solved with ``jax.lax.associative_scan`` (O(log U) depth, fully
  vectorized over batch and labels), and a single ``lax.scan`` walks the T
  sequential time steps.  No Python loops, static shapes, XLA-fusable.
- The gradient is analytic (`jax.custom_vjp`): occupancies from alpha+beta,
  so backward costs the same as forward instead of differentiating through
  the scans.

Shapes:  logits [B, T, U+1, V]; labels [B, U] int32; logit_lengths [B] (valid
encoder frames, already divided by any time reduction — ref loss.py:31-33 does
this at the call site); label_lengths [B].  Blank id is 0 (vocabulary.py:4).
Returns per-example negative log-likelihood [B] (summing/averaging is the
caller's policy, matching run_rnnt.py:278).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Large negative stand-in for log(0): finite so NEG+NEG etc. stay well-defined
# in fp32 (|NEG|*max(T,U) << fp32 max), and exp(NEG - L) == 0 exactly.
NEG = -1e30


def _pvary_like(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Promote x's varying-mesh-axes set (vma) to match `like`.

    Inside a shard_map (the TP fused-loss path wraps these scans), literals
    like jnp.full carry an empty vma while the lattice planes vary over the
    data axis — lax.scan requires carry-in/carry-out vma to match.  No-op
    outside shard_map.
    """
    want = frozenset(getattr(jax.typeof(like), "vma", ()) or ())
    have = frozenset(getattr(jax.typeof(x), "vma", ()) or ())
    missing = tuple(want - have)
    if not missing:
        return x
    try:
        return jax.lax.pcast(x, missing, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, missing)


def _row_scan(c: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Solve x[u] = logaddexp(c[u], w[u] + x[u-1]) (x[-1] = -inf) along axis -1.

    The recurrence composes affine maps in the log semiring
    f_u(x) = logaddexp(c_u, w_u + x); composition is associative:
    (w_a,c_a) then (w_b,c_b) == (w_a+w_b, logaddexp(c_b, w_b+c_a)).
    """

    def comb(a, b):
        wa, ca = a
        wb, cb = b
        return wa + wb, jnp.logaddexp(cb, wb + ca)

    _, x = jax.lax.associative_scan(comb, (w, c), axis=-1)
    return x


def _row_scan_rev(c: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Solve x[u] = logaddexp(c[u], w[u] + x[u+1]) (x[U] = -inf) along axis -1."""
    return jnp.flip(_row_scan(jnp.flip(c, -1), jnp.flip(w, -1)), -1)


def _alpha_scan(b: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Forward lattice probabilities.

    alpha[t,u] = logaddexp(alpha[t-1,u] + b[t-1,u], alpha[t,u-1] + e[t,u-1]),
    alpha[0,0] = 0.  b/e/result: [B, T, U+1].
    """
    B, T, U1 = b.shape
    # w[u] = e[t, u-1]: label-step coefficient entering column u.
    e_shift = jnp.concatenate([jnp.full((B, T, 1), NEG, b.dtype), e[:, :, :-1]], axis=2)

    c0 = jnp.full((B, U1), NEG, b.dtype).at[:, 0].set(0.0)
    a0 = _row_scan(_pvary_like(c0, b), e_shift[:, 0])

    def step(a_prev, xs):
        b_prev, w = xs  # b[t-1]: time-step coefficient; w: within-row label steps
        a_t = _row_scan(a_prev + b_prev, w)
        return a_t, a_t

    if T > 1:
        _, rest = jax.lax.scan(
            step,
            a0,
            (jnp.moveaxis(b[:, :-1], 1, 0), jnp.moveaxis(e_shift[:, 1:], 1, 0)),
        )
        return jnp.concatenate([a0[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    return a0[:, None]


def _beta_scan(
    b: jnp.ndarray, e: jnp.ndarray, logit_lengths: jnp.ndarray, label_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Backward lattice probabilities.

    beta[t,u] = logaddexp(b[t,u] + beta[t+1,u], e[t,u] + beta[t,u+1]) with the
    terminal beta[T_b-1, U_b] rooted at the final mandatory blank.  Variable
    lengths are handled by injecting a virtual beta[T_b] row (0 at u == U_b)
    exactly when the reverse scan reaches t == T_b - 1.
    """
    B, T, U1 = b.shape
    u_idx = jnp.arange(U1, dtype=label_lengths.dtype)[None, :]
    term_row = jnp.where(u_idx == label_lengths[:, None], 0.0, NEG).astype(b.dtype)

    def step(beta_next, xs):
        b_t, e_t, t = xs
        beta_next = jnp.where((t == logit_lengths - 1)[:, None], term_row, beta_next)
        x = _row_scan_rev(b_t + beta_next, e_t)
        return x, x

    ts = jnp.arange(T - 1, -1, -1)
    _, betas = jax.lax.scan(
        step,
        _pvary_like(jnp.full((B, U1), NEG, b.dtype), b),
        (jnp.moveaxis(jnp.flip(b, 1), 1, 0), jnp.moveaxis(jnp.flip(e, 1), 1, 0), ts),
    )
    return jnp.flip(jnp.moveaxis(betas, 0, 1), 1)


def _gather_coeffs(logits32, labels, label_lengths):
    """Per-cell log-softmax denominator and blank/emit coefficient planes.

    Never materializes the [B,T,U+1,V] log-probs: the denominator [B,T,U+1]
    is the only V-reduction stored; b/e come from two fused gathers.  (The
    backward pass reconstructs softmax from logits - denom elementwise.)
    """
    B, T, U1, V = logits32.shape
    mx = jnp.max(logits32, axis=-1)
    denom = mx + jnp.log(jnp.sum(jnp.exp(logits32 - mx[..., None]), axis=-1))
    b = logits32[..., 0] - denom  # blank id == 0 (vocabulary.py:4)
    labels_pad = jnp.concatenate(
        [labels, jnp.zeros((B, 1), labels.dtype)], axis=1
    )  # index row U safely
    e = jnp.take_along_axis(
        logits32, labels_pad[:, None, :, None], axis=-1)[..., 0] - denom
    u_idx = jnp.arange(U1)[None, None, :]
    e = jnp.where(u_idx < label_lengths[:, None, None], e, NEG)
    return denom, b, e


def _forward(logits, labels, logit_lengths, label_lengths):
    logits32 = logits.astype(jnp.float32)
    denom, b, e = _gather_coeffs(logits32, labels, label_lengths)
    alpha = _alpha_scan(b, e)
    beta = _beta_scan(b, e, logit_lengths, label_lengths)
    ll = beta[:, 0, 0]  # total path log-likelihood
    return -ll, (denom, b, e, alpha, beta, ll)


@jax.custom_vjp
def rnnt_loss_ref(logits, labels, logit_lengths, label_lengths):
    """Per-example RNN-T negative log-likelihood (pure-JAX reference)."""
    loss, _ = _forward(logits, labels, logit_lengths, label_lengths)
    return loss


def _fwd(logits, labels, logit_lengths, label_lengths):
    loss, (denom, b, e, alpha, beta, ll) = _forward(
        logits, labels, logit_lengths, label_lengths
    )
    res = (logits, denom, b, e, alpha, beta, ll, labels, logit_lengths,
           label_lengths)
    return loss, res


def _bwd(res, ct):
    (logits, denom, b, e, alpha, beta, ll, labels, logit_lengths,
     label_lengths) = res
    in_dtype = logits.dtype
    B, T, U1, V = logits.shape

    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    valid = (t_idx < logit_lengths[:, None, None]) & (
        u_idx <= label_lengths[:, None, None]
    )

    # Virtual beta[t+1] row: within range it is beta[t+1]; at t == T_b-1 it is
    # the terminal (0 at u == U_b); elsewhere log(0).
    term_row = jnp.where(u_idx[:, 0] == label_lengths[:, None], 0.0, NEG)[:, None, :]
    beta_dn = jnp.concatenate([beta[:, 1:], jnp.full((B, 1, U1), NEG, beta.dtype)], 1)
    beta_dn = jnp.where(t_idx == (logit_lengths[:, None, None] - 1), term_row, beta_dn)
    beta_rt = jnp.concatenate([beta[:, :, 1:], jnp.full((B, T, 1), NEG, beta.dtype)], 2)

    lln = ll[:, None, None]
    occ = jnp.where(valid, jnp.exp(alpha + beta - lln), 0.0)  # node occupancy
    g_blank = jnp.where(valid, jnp.exp(alpha + b + beta_dn - lln), 0.0)
    g_emit = jnp.where(valid, jnp.exp(alpha + e + beta_rt - lln), 0.0)

    # d(-ll)/dlogits = softmax * occ - (blank + emit scatter).  softmax is
    # recomputed elementwise from logits - denom (never stored); the emit
    # scatter is a broadcasted one-hot product — the whole expression is one
    # fused elementwise pass over [B,T,U+1,V] for XLA.
    labels_pad = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], axis=1)
    grad = jnp.exp(logits.astype(jnp.float32) - denom[..., None]) * occ[..., None]
    grad = grad.at[..., 0].add(-g_blank)
    onehot = jax.nn.one_hot(labels_pad, V, dtype=grad.dtype)[:, None]  # [B,1,U+1,V]
    grad = grad - g_emit[..., None] * onehot

    grad = grad * ct[:, None, None, None]
    f0 = jax.dtypes.float0
    return (
        grad.astype(in_dtype),
        np.zeros(labels.shape, dtype=f0),
        np.zeros(logit_lengths.shape, dtype=f0),
        np.zeros(label_lengths.shape, dtype=f0),
    )


rnnt_loss_ref.defvjp(_fwd, _bwd)


def rnnt_loss_numpy(logits, labels, logit_lengths, label_lengths):
    """O(T·U) NumPy lattice DP — test oracle only (mirrors warp-transducer's
    naive CPU path, cmake/warp-rnnt-cmakelist.txt:119). Not for production."""
    logits = np.asarray(logits, np.float64)
    B, T, U1, V = logits.shape
    lp = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    out = np.zeros(B)
    for i in range(B):
        Tb, Ub = int(logit_lengths[i]), int(label_lengths[i])
        alpha = np.full((Tb, Ub + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    continue
                acc = -np.inf
                if t > 0:
                    acc = np.logaddexp(acc, alpha[t - 1, u] + lp[i, t - 1, u, 0])
                if u > 0:
                    acc = np.logaddexp(acc, alpha[t, u - 1] + lp[i, t, u - 1, labels[i, u - 1]])
                alpha[t, u] = acc
        out[i] = -(alpha[Tb - 1, Ub] + lp[i, Tb - 1, Ub, 0])
    return out
