"""RNN-T loss with the lattice recursion as a fused Pallas TPU kernel.

The warp-transducer replacement (cmake/warp-rnnt-cmakelist.txt:99 — CUDA
alpha/beta kernels).  Division of labor, TPU-first:

- XLA handles the [B,T,U+1,V] work (log-softmax denominator reduction,
  blank/label gathers, and the fused elementwise backward) — these are
  bandwidth-bound V-reductions XLA already emits optimally.
- Pallas handles what XLA does badly: the T-sequential / U-recursive
  alpha/beta dynamic program.  A `lax.scan` would launch T tiny [B,U] steps
  through HBM; the kernel instead keeps the whole (b, e) coefficient planes
  **resident in VMEM** and runs all T steps in one launch, solving each row
  with a log-semiring Hillis-Steele doubling scan over the U lanes
  (x[u] = logaddexp(c[u], w[u] + x[u-1]) — an associative affine composition
  in (max,+,logaddexp) space).

Layout: planes are [T, B, U1p] with B on sublanes and U padded to the
128-lane boundary; the grid partitions the batch into 8-row blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rnnt_tpu.ops.rnnt_loss_ref as ref

NEG = ref.NEG


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_right(x, s, fill):
    B, U = x.shape
    return jnp.concatenate([jnp.full((B, s), fill, x.dtype), x[:, :-s]], axis=1)


def _shift_left(x, s, fill):
    B, U = x.shape
    return jnp.concatenate([x[:, s:], jnp.full((B, s), fill, x.dtype)], axis=1)


def _row_scan_fwd(c, w, n_lanes):
    """x[u] = logaddexp(c[u], w[u] + x[u-1]) via doubling (log-semiring)."""
    W, C = w, c
    s = 1
    while s < n_lanes:
        Cp = _shift_right(C, s, NEG)
        Wp = _shift_right(W, s, 0.0)
        C = jnp.logaddexp(C, W + Cp)
        W = W + Wp
        s *= 2
    return C


def _row_scan_rev(c, w, n_lanes):
    """x[u] = logaddexp(c[u], w[u] + x[u+1]) via doubling."""
    W, C = w, c
    s = 1
    while s < n_lanes:
        Cp = _shift_left(C, s, NEG)
        Wp = _shift_left(W, s, 0.0)
        C = jnp.logaddexp(C, W + Cp)
        W = W + Wp
        s *= 2
    return C


def _lattice_kernel(b_ref, e_ref, fl_ref, yl_ref, alpha_ref, beta_ref, ll_ref,
                    *, T: int, U1p: int):
    BB = b_ref.shape[1]
    fl = fl_ref[:, 0:1]                      # [BB, 1] int32
    yl = yl_ref[:, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, U1p), 1)
    c0 = jnp.where(lane == 0, 0.0, NEG)      # alpha init row
    term_row = jnp.where(lane == yl, 0.0, NEG).astype(jnp.float32)

    def e_row(t):
        return e_ref[t]

    def b_row(t):
        return b_ref[t]

    # ---- alpha (forward) ----
    def fwd_body(t, a_prev):
        b_prev = b_ref[jnp.maximum(t - 1, 0)]
        c = jnp.where(t == 0, c0, a_prev + b_prev)
        w = _shift_right(e_row(t), 1, NEG)
        a = _row_scan_fwd(c, w, U1p)
        alpha_ref[t] = a
        return a

    jax.lax.fori_loop(0, T, fwd_body, jnp.full((BB, U1p), NEG, jnp.float32))

    # ---- beta (reverse, with terminal injection at t == T_b - 1) ----
    def rev_body(i, beta_next):
        t = T - 1 - i
        beta_next = jnp.where(t == fl - 1, term_row, beta_next)
        c = b_row(t) + beta_next
        x = _row_scan_rev(c, e_row(t), U1p)
        beta_ref[t] = x
        return x

    beta0 = jax.lax.fori_loop(
        0, T, rev_body, jnp.full((BB, U1p), NEG, jnp.float32))
    ll_ref[:, :] = beta0[:, 0:1]


def lattice_scan_pallas(b, e, logit_lengths, label_lengths, *,
                        interpret: bool = False, batch_block: int = 8):
    """alpha, beta [B,T,U1] and total log-likelihood ll [B] from coefficient
    planes b, e [B,T,U1] (b = blank log-prob, e = label log-prob, pre-masked
    with NEG beyond label_lengths)."""
    B, T, U1 = b.shape
    U1p = _round_up(U1, 128)
    BB = min(batch_block, B)
    Bp = _round_up(B, BB)

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, U1p - U1)),
                    constant_values=NEG)
        return jnp.moveaxis(x, 1, 0)  # [T, Bp, U1p]

    bT, eT = prep(b), prep(e)
    fl = jnp.pad(logit_lengths.astype(jnp.int32), (0, Bp - B),
                 constant_values=1)[:, None]
    yl = jnp.pad(label_lengths.astype(jnp.int32), (0, Bp - B),
                 constant_values=0)[:, None]

    grid = (Bp // BB,)
    plane_spec = pl.BlockSpec((T, BB, U1p), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((BB, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    alpha, beta, ll = pl.pallas_call(
        functools.partial(_lattice_kernel, T=T, U1p=U1p),
        grid=grid,
        in_specs=[plane_spec, plane_spec, len_spec, len_spec],
        out_specs=[plane_spec, plane_spec, len_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, U1p), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bT, eT, fl, yl)
    alpha = jnp.moveaxis(alpha, 0, 1)[:B, :, :U1]
    beta = jnp.moveaxis(beta, 0, 1)[:B, :, :U1]
    return alpha, beta, ll[:B, 0]


def _forward_pallas(logits, labels, logit_lengths, label_lengths, interpret):
    logits32 = logits.astype(jnp.float32)
    denom, b, e = ref._gather_coeffs(logits32, labels, label_lengths)
    alpha, beta, ll = lattice_scan_pallas(
        b, e, logit_lengths, label_lengths, interpret=interpret)
    return -ll, (denom, b, e, alpha, beta, ll)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rnnt_loss_pallas(logits, labels, logit_lengths, label_lengths,
                      interpret=False):
    loss, _ = _forward_pallas(logits, labels, logit_lengths, label_lengths,
                              interpret)
    return loss


def _fwd(logits, labels, logit_lengths, label_lengths, interpret):
    loss, (denom, b, e, alpha, beta, ll) = _forward_pallas(
        logits, labels, logit_lengths, label_lengths, interpret)
    return loss, (logits, denom, b, e, alpha, beta, ll, labels,
                  logit_lengths, label_lengths)


def _bwd(interpret, res, ct):
    # identical occupancy-based gradient as the reference implementation
    return ref._bwd(res, ct)


_rnnt_loss_pallas.defvjp(_fwd, _bwd)


def rnnt_loss_pallas(logits, labels, logit_lengths, label_lengths,
                     *, interpret=None):
    """Per-example RNN-T NLL with the Pallas lattice kernel.

    interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True
    return _rnnt_loss_pallas(logits, labels, logit_lengths, label_lengths,
                             interpret)
