"""Banded (pruned) fused joint + RNN-T loss.

Opt-in approximation of the full-lattice loss (ops/joint_loss_fused.py):
the joint-network V-reduction — the dominant cost of RNN-T training — is
computed only inside a width-`band` label window around each utterance's
expected alignment diagonal (u ≈ t · U_b/T_b), the pruned-transducer idea
(cf. BAT, arXiv:2305.11571, and k2's pruned rnnt).  Paths outside the band
get log-prob -inf, so the result is a lower bound on the true
log-likelihood that converges to it as `band -> U+1`; with band >= U+1 it
is EXACT (tested).  Compute drops by (U+1)/band in both the forward planes
and the backward recompute.

TPU-first trick — zero new kernel code: each (example, t-tile) pair becomes
one "batch row" of the existing fused planes kernel.  The per-example label
window g[b, u0[b,t]: u0+W] is gathered by XLA (per-EXAMPLE band offsets, no
tile-sharing constraints), f is reshaped [B·nT, Tt, J], and the kernel runs
with (T=Tt, U+1=W).  The alpha/beta scans stay full-lattice (they carry no
V dimension and cost nothing); banded b/e coefficient planes are scattered
into [B, T, U+1] with NEG outside the band.

Reference provenance: the CUDA warp-transducer computed the full T×U
lattice unconditionally (cmake/warp-rnnt-cmakelist.txt:99); this is the
capability the reference could not offer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import rnnt_tpu.ops.rnnt_loss_ref as ref
from rnnt_tpu.ops.joint_loss_fused import (
    _compute_planes, combine_tp_planes, shift_labels_tp, tp_axis_for)

NEG = ref.NEG
_T_TILE = 8  # t rows per band window (matches the planes kernel's Tt)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def band_starts(enc_lengths, label_lengths, T: int, U1: int, band: int,
                t_tile: int = _T_TILE):
    """u0 [B, nT] int32: per-(example, t-tile) band start (clipped).

    Centers the window on the linear alignment u = t · U_b/T_b; the terminal
    cell (T_b-1, U_b) and the origin (0, 0) always fall inside.
    """
    nT = _round_up(T, t_tile) // t_tile
    mid_t = jnp.arange(nT, dtype=jnp.float32) * t_tile + (t_tile - 1) / 2.0
    el = jnp.maximum(enc_lengths.astype(jnp.float32), 1.0)[:, None]
    ul = label_lengths.astype(jnp.float32)[:, None]
    center = jnp.minimum(mid_t[None, :], el - 1.0) / jnp.maximum(el - 1.0, 1.0) * ul
    u0 = jnp.round(center - (band - 1) / 2.0).astype(jnp.int32)
    u0 = u0.at[:, 0].set(0)  # every path starts at (0, 0)
    return jnp.clip(u0, 0, max(0, U1 - band))


def _gather_band(x, u0_full, band):
    """x [B, U1(, J)] -> [B, T, band(, J)] windows at per-(b,t) offsets."""
    B, T = u0_full.shape
    idx = u0_full[..., None] + jnp.arange(band, dtype=jnp.int32)  # [B,T,W]
    if x.ndim == 2:
        return jnp.take_along_axis(x[:, None, :], idx, axis=2)
    return jnp.take_along_axis(
        x[:, None, :, :], idx[..., None], axis=2)


def _scatter_band(banded, u0_full, U1):
    """banded [B, T, W] -> full [B, T, U1] with NEG outside the band."""
    B, T, W = banded.shape
    u = jnp.arange(U1, dtype=jnp.int32)[None, None, :]
    w = u - u0_full[..., None]                       # [B, T, U1]
    padded = jnp.concatenate(
        [banded, jnp.full((B, T, 1), NEG, banded.dtype)], axis=2)
    vals = jnp.take_along_axis(padded, jnp.clip(w, 0, W), axis=2)
    return jnp.where((w >= 0) & (w < W), vals, NEG)


def _banded_planes(f, g, b1, w2, b2, labels, label_lengths, u0, band,
                   axis=None):
    """Banded denom/b/e planes: (denom_band, b_full, e_full, labels_pad)."""
    B, T, J = f.shape
    U1 = g.shape[1]
    nT = u0.shape[1]
    Tp = nT * _T_TILE
    labels_pad = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], 1)

    u0_full = jnp.repeat(u0, _T_TILE, axis=1)[:, :T]             # [B, T]
    # per-(b, t-tile) windows -> rows of the planes kernel "batch"
    g_band = jnp.take_along_axis(
        g[:, None, :, :],
        (u0[..., None] + jnp.arange(band, dtype=jnp.int32))[..., None],
        axis=2)                                                   # [B,nT,W,J]
    y_band = jnp.take_along_axis(
        labels_pad[:, None, :], u0[..., None] + jnp.arange(band, dtype=jnp.int32),
        axis=2)                                                   # [B,nT,W]
    f_pad = jnp.pad(f, ((0, 0), (0, Tp - T), (0, 0)))
    f_rows = f_pad.reshape(B, nT, _T_TILE, J).reshape(B * nT, _T_TILE, J)
    g_rows = g_band.reshape(B * nT, band, J)
    y_rows = y_band.reshape(B * nT, band)

    if axis is not None:  # vocab-sharded w2: local label coords + combine
        y_rows = shift_labels_tp(y_rows, w2, axis)
    denom, blank, emit = _compute_planes(f_rows, g_rows, y_rows, b1, w2, b2,
                                         Tt=_T_TILE)
    if axis is not None:
        denom, blank, emit = combine_tp_planes(denom, blank, emit, axis)
    def unrows(x):  # [B*nT, Tt, W] -> [B, T, W]
        return x.reshape(B, nT * _T_TILE, band)[:, :T]
    denom_b, blank_b, emit_b = unrows(denom), unrows(blank), unrows(emit)

    b_band = blank_b - denom_b
    e_band = emit_b - denom_b
    # emit only below label_length (ref._gather_coeffs contract), band-aware
    u_abs = u0_full[..., None] + jnp.arange(band, dtype=jnp.int32)[None, None]
    e_band = jnp.where(u_abs < label_lengths[:, None, None], e_band, NEG)

    b_full = _scatter_band(b_band, u0_full, U1)
    e_full = _scatter_band(e_band, u0_full, U1)
    return denom_b, b_full, e_full, labels_pad, u0_full


def _forward(band, f, g, b1, w2, b2, labels, logit_lengths, label_lengths,
             axis=None):
    B, T, J = f.shape
    U1 = g.shape[1]  # already padded to a multiple of 8 by the wrapper
    u0 = band_starts(logit_lengths, label_lengths, T, U1, band)
    denom_b, b, e, labels_pad, u0_full = _banded_planes(
        f, g, b1, w2, b2, labels, label_lengths, u0, band, axis=axis)
    alpha = ref._alpha_scan(b, e)
    beta = ref._beta_scan(b, e, logit_lengths, label_lengths)
    ll = beta[:, 0, 0]
    # An utterance whose U_b/T_b slope exceeds ~band per t-tile has EVERY
    # path pruned: ll = log(0) (a stack of finite NEGs).  Report a large
    # finite loss and zero its gradient in _bwd — otherwise the NEG
    # cancellation in exp(alpha + beta - ll) manufactures occupancy 1 at
    # every unreachable cell and the gradients blow up to NaN.  Size `band`
    # to the corpus U/T' slope (x t-tile 8) to keep this rare.
    ll = jnp.where(ll > NEG / 2, ll, -1e9)
    return -ll, (denom_b, b, e, alpha, beta, ll, u0_full)


def rnnt_loss_banded(f, g, b1, w2, b2, labels, logit_lengths, label_lengths,
                     *, band: int = 16):
    """Per-example banded RNN-T NLL from pre-projected joint inputs.

    Same contract as rnnt_loss_fused plus `band` (label-window width); the
    returned NLL upper-bounds the exact NLL and equals it for band >= U+1.
    `band` is rounded up to a multiple of 8 (the planes kernel's u-tile);
    the label axis is zero-padded likewise (padded rows are unreachable:
    emit there is -inf, so their occupancy — hence gradient — is exactly 0;
    normal AD slices the pad back off).
    """
    B, U1, J = g.shape
    W = _round_up(min(band, U1), 8)
    U1p = _round_up(max(U1, W), 8)
    g = jnp.pad(g, ((0, 0), (0, U1p - U1), (0, 0)))
    labels = jnp.pad(labels, ((0, 0), (0, U1p - 1 - labels.shape[1])))
    return _banded_call(W, f, g, b1, w2, b2, labels, logit_lengths,
                        label_lengths)


@functools.lru_cache(maxsize=None)
def _make_banded_call(axis):
    """custom_vjp'd banded loss; axis = mesh axis w2/b2 are vocab-sharded
    over (None = single shard).  Same TP contract as joint_loss_fused."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
    def call(band, f, g, b1, w2, b2, labels, logit_lengths, label_lengths):
        loss, _ = _forward(band, f, g, b1, w2, b2, labels, logit_lengths,
                           label_lengths, axis=axis)
        return loss

    def fwd(band, f, g, b1, w2, b2, labels, logit_lengths, label_lengths):
        loss, (denom_b, b, e, alpha, beta, ll, u0_full) = _forward(
            band, f, g, b1, w2, b2, labels, logit_lengths, label_lengths,
            axis=axis)
        res = (f, g, b1, w2, b2, denom_b, b, e, alpha, beta, ll, u0_full,
               labels, logit_lengths, label_lengths)
        return loss, res

    call.defvjp(fwd, functools.partial(_bwd, axis=axis))
    return call


_BWD_CHUNK = 8


def _bwd(band, res, ct, axis=None):
    (f, g, b1, w2, b2, denom_b, b, e, alpha, beta, ll, u0_full,
     labels, logit_lengths, label_lengths) = res
    B, T, J = f.shape
    U1 = g.shape[1]
    V = w2.shape[1]  # LOCAL vocab width under tensor parallelism
    W = denom_b.shape[-1]
    if axis is not None:
        shard = jax.lax.axis_index(axis)
        blank_own = (shard == 0).astype(jnp.float32)
        y_off = shard * V
        # check_vma=False shard_map splits the replicated-output cotangent
        # across model shards; undo it — grads below are per-shard PARTIALS
        # completed by the boundary-transpose psums (see joint_loss_fused)
        ct = ct * jax.lax.psum(1, axis)
    else:
        blank_own, y_off = 1.0, 0

    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    valid = (t_idx < logit_lengths[:, None, None]) & (
        u_idx <= label_lengths[:, None, None])

    term_row = jnp.where(u_idx[:, 0] == label_lengths[:, None], 0.0, NEG)[:, None, :]
    beta_dn = jnp.concatenate([beta[:, 1:], jnp.full((B, 1, U1), NEG)], 1)
    beta_dn = jnp.where(t_idx == (logit_lengths[:, None, None] - 1), term_row,
                        beta_dn)
    beta_rt = jnp.concatenate([beta[:, :, 1:], jnp.full((B, T, 1), NEG)], 2)

    # fully-pruned examples (ll clamped to -1e9 in _forward) get zero gradient
    alive = (ll > -1e9 / 2)[:, None, None]
    valid = valid & alive
    lln = ll[:, None, None]
    occ = jnp.where(valid, jnp.exp(alpha + beta - lln), 0.0) * ct[:, None, None]
    g_blank = (jnp.where(valid, jnp.exp(alpha + b + beta_dn - lln), 0.0)
               * ct[:, None, None])
    g_emit = (jnp.where(valid, jnp.exp(alpha + e + beta_rt - lln), 0.0)
              * ct[:, None, None])

    # gather everything to the band (occupancies are exactly 0 outside)
    occ_b = _gather_band_t(occ, u0_full, W)
    gbl_b = _gather_band_t(g_blank, u0_full, W)
    gem_b = _gather_band_t(g_emit, u0_full, W)
    labels_pad = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], 1)
    y_b = jnp.take_along_axis(
        labels_pad[:, None, :],
        u0_full[..., None] + jnp.arange(W, dtype=jnp.int32), axis=2)  # [B,T,W]
    g_b = _gather_band(g, u0_full, W)                                 # [B,T,W,J]

    compute_dtype = w2.dtype

    def chunk_bwd(chunk):
        fc, gbc, occc, gblc, gemc, denc, ybc, u0c = chunk
        pre = (fc.astype(jnp.float32)[:, :, None, :]
               + gbc.astype(jnp.float32) + b1.astype(jnp.float32))
        h = jnp.tanh(pre)                          # [c, T, W, J]
        hb = h.astype(compute_dtype)
        logits = jnp.dot(hb, w2, preferred_element_type=jnp.float32) \
            + b2.astype(jnp.float32)
        softmax = jnp.exp(logits - denc[..., None])
        onehot = jax.nn.one_hot(ybc - y_off, V,
                                dtype=jnp.float32)   # [c, T, W, V_local]
        dlogits = (softmax * occc[..., None]).at[..., 0].add(
            -gblc * blank_own) - gemc[..., None] * onehot

        dlb = dlogits.astype(compute_dtype)
        dh = jnp.dot(dlb, w2.T, preferred_element_type=jnp.float32)
        dw2_c = jax.lax.dot_general(
            hb, dlb, (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_c = jnp.sum(dlogits, axis=(0, 1, 2))

        dpre = dh * (1.0 - h * h)                  # [c, T, W, J]
        df_c = jnp.sum(dpre, axis=2).astype(f.dtype)
        db1_c = jnp.sum(dpre, axis=(0, 1, 2))
        # band -> label-row gradient as a one-hot MXU matmul (a scatter-add
        # here serializes on TPU and erases the banding win):
        # dg[b,u,j] = sum_{t,w} dpre[b,t,w,j] * [u0[b,t]+w == u]
        idx = u0c[..., None] + jnp.arange(W, dtype=jnp.int32)  # [c, T, W]
        onehot_u = jax.nn.one_hot(idx, U1, dtype=compute_dtype)  # [c,T,W,U1]
        dg_c = jax.lax.dot_general(
            onehot_u, dpre.astype(compute_dtype),
            (((1, 2), (1, 2)), ((0,), (0,))),      # contract (T,W), batch c
            preferred_element_type=jnp.float32)    # [c, U1, J]
        return df_c, dg_c.astype(g.dtype), db1_c, dw2_c, db2_c

    chunk = 1
    for cand in range(min(B, _BWD_CHUNK), 0, -1):
        if B % cand == 0:
            chunk = cand
            break
    nc = B // chunk
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((nc, chunk) + x.shape[1:]),
        (f, g_b, occ_b, gbl_b, gem_b, denom_b, y_b, u0_full))
    df, dg, db1, dw2, db2 = jax.lax.map(chunk_bwd, chunked)

    f0 = jax.dtypes.float0
    return (df.reshape(f.shape), dg.reshape((B, U1, J)).astype(g.dtype),
            jnp.sum(db1, 0).astype(b1.dtype),
            jnp.sum(dw2, 0).astype(w2.dtype),
            jnp.sum(db2, 0).astype(b2.dtype),
            np.zeros(labels.shape, f0), np.zeros(logit_lengths.shape, f0),
            np.zeros(label_lengths.shape, f0))


def _gather_band_t(x, u0_full, W):
    """x [B, T, U1] -> [B, T, W] at per-(b,t) band offsets."""
    idx = u0_full[..., None] + jnp.arange(W, dtype=jnp.int32)
    return jnp.take_along_axis(x, idx, axis=2)


_banded_call = _make_banded_call(None)


def transducer_loss_banded(joint_params, enc, pred, labels, enc_lengths,
                           label_lengths, *, band: int = 16):
    """Full banded path from encoder/prediction activations (the banded twin
    of joint_loss_fused.transducer_loss_fused).

    Under a mesh with model-axis > 1 the loss runs shard_mapped with W2/b2
    vocab-sharded, same design as the fused path (no W2 all-gather)."""
    axis, data_axes = tp_axis_for(joint_params["w2"])
    w1 = joint_params["w1"]
    if axis is None:
        f = jnp.dot(enc, w1,
                    preferred_element_type=jnp.float32).astype(enc.dtype)
        g = jnp.dot(pred, w1,
                    preferred_element_type=jnp.float32).astype(pred.dtype)
        return rnnt_loss_banded(
            f, g, joint_params["b1"], joint_params["w2"], joint_params["b2"],
            labels, enc_lengths, label_lengths, band=band)

    from jax.sharding import PartitionSpec as P

    from rnnt_tpu.ops.joint_loss_fused import _vma_join

    dspec = P(data_axes)
    call = _make_banded_call(axis)

    def body(w1, b1, w2, b2, enc, pred, labels, enc_lengths, label_lengths):
        enc_j, pred_j, w1_j = _vma_join(enc, pred, w1)
        f = jnp.dot(enc_j, w1_j,
                    preferred_element_type=jnp.float32).astype(enc.dtype)
        g = jnp.dot(pred_j, w1_j,
                    preferred_element_type=jnp.float32).astype(pred.dtype)
        B, U1, J = g.shape
        W = _round_up(min(band, U1), 8)
        U1p = _round_up(max(U1, W), 8)
        g = jnp.pad(g, ((0, 0), (0, U1p - U1), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, U1p - 1 - labels.shape[1])))
        return call(W, f, g, b1, w2, b2, labels, enc_lengths, label_lengths)

    return jax.shard_map(
        body,
        in_specs=(P(), P(), P(None, axis), P(axis),
                  dspec, dspec, dspec, dspec, dspec),
        out_specs=dspec,
        check_vma=False,  # same rationale as joint_loss_fused
    )(w1, joint_params["b1"], joint_params["w2"], joint_params["b2"],
      enc, pred, labels, enc_lengths, label_lengths)
