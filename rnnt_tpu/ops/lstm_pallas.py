"""Projected-LSTM sequence kernels for TPU (Pallas).

Why: profiled on v5e, the XLA `lax.scan` LSTM is weight-streaming bound —
every timestep re-reads Wh (10.5 MB) + Wp (2.6 MB) from HBM, ~20 GB per
training step at the parity config.  These kernels pin the recurrent weights
in VMEM for the WHOLE sequence and stream only the per-step activations:

- forward: grid (b-blocks, T); carries (c fp32, h) in VMEM scratch; one
  [Bt,P]x[P,4H] MXU matmul + gate math + [Bt,H]x[H,P] projection per step;
  emits h_seq plus the (z, c) residuals the backward needs.
- backward: same structure reversed; recomputes gate activations from the
  saved pre-activations z, carries (dc, dh) across steps, emits dz_seq and
  dh_total_seq; the weight gradients then fall out as three big MXU matmuls
  in XLA (dWx = x'dz, dWh = h_prev'dz, dWp = hid'dh_total).

Gate order matches rnnt_tpu.models.lstm (i, g, f, o) so parameters are
interchangeable with the scan implementation; `lstm_seq` is a drop-in for
`lstm_layer` with identical semantics (verified to ~1e-5 in tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _round_up(x, m):
    return (x + m - 1) // m * m


def _compiler_params():
    # b-blocks are independent (scratch state resets at t==0 per block); the
    # t dimension carries the recurrence.  Raise the scoped-VMEM ceiling past
    # the 16 MB default so large batch tiles (Bt=96: ~17 MB of live blocks in
    # the backward) compile — the chip has 128 MB of VMEM.
    try:
        from jax.experimental.pallas import tpu as _pltpu
        return _pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
    except Exception:
        return None


_COMPILER_PARAMS = _compiler_params()


# ---------------------------------------------------------------- forward

def _fwd_kernel(xp_ref, wh_ref, wp_ref, bias_ref, h0_ref, c0_ref,
                hseq_ref, zseq_ref, cseq_ref, hfin_ref, cfin_ref,
                h_scr, c_scr, *, H, nT):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = h0_ref[...].astype(jnp.float32)
        c_scr[...] = c0_ref[...]

    z = (xp_ref[0].astype(jnp.float32)
         + bias_ref[...].astype(jnp.float32)
         + jnp.dot(h_scr[...].astype(wh_ref.dtype), wh_ref[...],
                   preferred_element_type=jnp.float32))
    i = jax.nn.sigmoid(z[:, 0:H])
    g = jnp.tanh(z[:, H:2 * H])
    f = jax.nn.sigmoid(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
    c = f * c_scr[...] + i * g
    hid = o * jnp.tanh(c)
    h = jnp.dot(hid.astype(wp_ref.dtype), wp_ref[...],
                preferred_element_type=jnp.float32)

    h_scr[...] = h
    c_scr[...] = c
    hseq_ref[0] = h.astype(hseq_ref.dtype)
    zseq_ref[0] = z.astype(zseq_ref.dtype)
    cseq_ref[0] = c.astype(cseq_ref.dtype)

    @pl.when(t == nT - 1)
    def _():
        hfin_ref[...] = h.astype(hfin_ref.dtype)
        cfin_ref[...] = c


def _fwd_call(xp, wh, wp, bias, h0, c0, *, Bt, dtype):
    """xp [T,B,4H] -> (h_seq [T,B,P], z_seq, c_seq, h_fin [B,P], c_fin [B,H])."""
    T, B, H4 = xp.shape
    H = H4 // 4
    P = wp.shape[1]
    nB = B // Bt
    kernel = functools.partial(_fwd_kernel, H=H, nT=T)
    seq = lambda d, i_=None: pl.BlockSpec(  # noqa: E731
        (1, Bt, d), lambda ib, t: (t, ib, 0), memory_space=pltpu.VMEM)
    vec = lambda d: pl.BlockSpec(  # noqa: E731
        (Bt, d), lambda ib, t: (ib, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda ib, t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nB, T),
        in_specs=[seq(H4), full(P, H4), full(H, P), full(1, H4),
                  vec(P), vec(H)],
        out_specs=[seq(P), seq(H4), seq(H), vec(P), vec(H)],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, P), dtype),
            jax.ShapeDtypeStruct((T, B, H4), dtype),
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, P), dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, P), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ],
        interpret=_interpret_default(),
        compiler_params=_COMPILER_PARAMS,
    )(xp, wh, wp, bias[None, :], h0, c0)


# ------------------------------------------------- inference-only forward

def _fwd_infer_kernel(xp_ref, wh_ref, wp_ref, bias_ref, h0_ref, c0_ref,
                      hseq_ref, hfin_ref, cfin_ref,
                      h_scr, c_scr, *, H, nT):
    """Forward without (z, c) residual emission — decode/eval path (skips
    ~4 GB of HBM writes per parity-scale batch that only BPTT needs)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = h0_ref[...].astype(jnp.float32)
        c_scr[...] = c0_ref[...]

    z = (xp_ref[0].astype(jnp.float32)
         + bias_ref[...].astype(jnp.float32)
         + jnp.dot(h_scr[...].astype(wh_ref.dtype), wh_ref[...],
                   preferred_element_type=jnp.float32))
    i = jax.nn.sigmoid(z[:, 0:H])
    g = jnp.tanh(z[:, H:2 * H])
    f = jax.nn.sigmoid(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
    c = f * c_scr[...] + i * g
    hid = o * jnp.tanh(c)
    h = jnp.dot(hid.astype(wp_ref.dtype), wp_ref[...],
                preferred_element_type=jnp.float32)

    h_scr[...] = h
    c_scr[...] = c
    hseq_ref[0] = h.astype(hseq_ref.dtype)

    @pl.when(t == nT - 1)
    def _():
        hfin_ref[...] = h.astype(hfin_ref.dtype)
        cfin_ref[...] = c


def lstm_seq_infer(params, x, state):
    """Inference twin of lstm_seq: same math, no residuals, NOT differentiable."""
    B, T, F = x.shape
    H4 = params["wh"].shape[1]
    H = H4 // 4
    P = params["wp"].shape[1]
    dtype = params["wh"].dtype
    Bt = _pick_bt(B)
    c0, h0 = state
    xp = jnp.dot(x.reshape(B * T, F), params["wx"],
                 preferred_element_type=jnp.float32)
    xp = jnp.moveaxis(xp.reshape(B, T, H4).astype(dtype), 1, 0)

    kernel = functools.partial(_fwd_infer_kernel, H=H, nT=T)
    seq = lambda d: pl.BlockSpec(  # noqa: E731
        (1, Bt, d), lambda ib, t: (t, ib, 0), memory_space=pltpu.VMEM)
    vec = lambda d: pl.BlockSpec(  # noqa: E731
        (Bt, d), lambda ib, t: (ib, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda ib, t: (0, 0), memory_space=pltpu.VMEM)

    h_seq, h_fin, c_fin = pl.pallas_call(
        kernel,
        grid=(B // Bt, T),
        in_specs=[seq(H4), full(P, H4), full(H, P), full(1, H4),
                  vec(P), vec(H)],
        out_specs=[seq(P), vec(P), vec(H)],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, P), dtype),
            jax.ShapeDtypeStruct((B, P), dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, P), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ],
        interpret=_interpret_default(),
        compiler_params=_COMPILER_PARAMS,
    )(xp, params["wh"], params["wp"], params["bias"][None, :],
      h0.astype(dtype), c0.astype(jnp.float32))
    return jnp.moveaxis(h_seq, 0, 1), (c_fin, h_fin.astype(h0.dtype))


# --------------------------------------------------------------- backward

def _bwd_kernel(zseq_ref, cseq_ref, cprev_ref, c0_ref, dhout_ref,
                whT_ref, wpT_ref,
                dzseq_ref, dhtot_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr, *, H, nT):
    it = pl.program_id(1)           # 0..T-1, walking t = T-1-it
    t_is_first_step = it == 0

    @pl.when(t_is_first_step)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    z = zseq_ref[0].astype(jnp.float32)
    i = jax.nn.sigmoid(z[:, 0:H])
    g = jnp.tanh(z[:, H:2 * H])
    f = jax.nn.sigmoid(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
    c_t = cseq_ref[0].astype(jnp.float32)
    is_t0 = it == nT - 1
    c_prev = jnp.where(is_t0, c0_ref[...], cprev_ref[0].astype(jnp.float32))

    dh_total = dhout_ref[0].astype(jnp.float32) + dh_scr[...]
    dhid = jnp.dot(dh_total.astype(wpT_ref.dtype), wpT_ref[...],
                   preferred_element_type=jnp.float32)
    tanh_c = jnp.tanh(c_t)
    do = dhid * tanh_c
    dc = dc_scr[...] + dhid * o * (1.0 - tanh_c * tanh_c)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_scr[...] = dc * f

    dz = jnp.concatenate([
        di * i * (1.0 - i),
        dg * (1.0 - g * g),
        df * f * (1.0 - f),
        do * o * (1.0 - o),
    ], axis=1)
    dzseq_ref[0] = dz.astype(dzseq_ref.dtype)
    dhtot_ref[0] = dh_total.astype(dhtot_ref.dtype)
    dh_scr[...] = jnp.dot(dz.astype(whT_ref.dtype), whT_ref[...],
                          preferred_element_type=jnp.float32)

    @pl.when(it == nT - 1)
    def _():
        dh0_ref[...] = dh_scr[...]
        dc0_ref[...] = dc_scr[...]


def _bwd_call(zseq, cseq, c0, dhout, whT, wpT, *, Bt, dtype):
    T, B, H4 = zseq.shape
    H = H4 // 4
    P = wpT.shape[0]
    nB = B // Bt
    kernel = functools.partial(_bwd_kernel, H=H, nT=T)

    def rev(d):
        return pl.BlockSpec((1, Bt, d), lambda ib, it: (T - 1 - it, ib, 0),
                            memory_space=pltpu.VMEM)

    def rev_prev(d):
        # c_{t-1}: block at t-1, clamped at t=0 (kernel switches to c0 there)
        return pl.BlockSpec(
            (1, Bt, d),
            lambda ib, it: (jnp.maximum(T - 2 - it, 0), ib, 0),
            memory_space=pltpu.VMEM)

    vec = lambda d, dt=jnp.float32: pl.BlockSpec(  # noqa: E731
        (Bt, d), lambda ib, it: (ib, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda ib, it: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nB, T),
        in_specs=[rev(H4), rev(H), rev_prev(H), vec(H), rev(P),
                  full(H4, P), full(P, H)],
        out_specs=[rev(H4), rev(P), vec(P), vec(H)],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), dtype),
            jax.ShapeDtypeStruct((T, B, P), dtype),
            jax.ShapeDtypeStruct((B, P), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, P), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ],
        interpret=_interpret_default(),
        compiler_params=_COMPILER_PARAMS,
    )(zseq, cseq, cseq, c0, dhout, whT, wpT)


# ------------------------------------------------------------- public op

def _pick_bt(B: int) -> int:
    # The MXU consumes 128 rows per pass: larger batch tiles fill more of
    # them per recurrent step AND re-fetch the VMEM-pinned weights fewer
    # times (once per b-block).  Measured on v5e at parity scale (B=96,
    # T=256): Bt=96 beats Bt=32 by ~8% end-to-end (see BASELINE.md).
    # Tiles above 32 need the raised scoped-VMEM ceiling (~17 MB of live
    # blocks in the backward at Bt=96 vs the 16 MB default) — only reach
    # for them when the CompilerParams override actually constructed.
    import os
    env = os.environ.get("RNNT_LSTM_BT")
    if env:
        bt = int(env)
        if B % bt == 0:
            return bt
    tiles = (128, 96, 64, 48, 32, 16, 8) if _COMPILER_PARAMS is not None \
        else (32, 16, 8)
    for bt in tiles:
        if B % bt == 0:
            return bt
    return B


@jax.custom_vjp
def lstm_seq(params, x, state):
    """Projected-LSTM over [B, T, F] with VMEM-resident weights.

    Drop-in for models.lstm.lstm_layer's scan: returns (h_seq [B,T,P],
    (c_fin, h_fin)).  params: {wx, wh, bias, wp} (models.lstm layout).
    """
    out, _ = _lstm_seq_fwd(params, x, state)
    return out


def _apply_fwd(params, x, state):
    B, T, F = x.shape
    H4 = params["wh"].shape[1]
    dtype = params["wh"].dtype
    c0, h0 = state
    xp = jnp.dot(x.reshape(B * T, F), params["wx"],
                 preferred_element_type=jnp.float32)
    xp = jnp.moveaxis(xp.reshape(B, T, H4).astype(dtype), 1, 0)  # [T,B,4H]
    h_seq, z_seq, c_seq, h_fin, c_fin = _fwd_call(
        xp, params["wh"], params["wp"], params["bias"],
        h0.astype(dtype), c0.astype(jnp.float32), Bt=_pick_bt(B), dtype=dtype)
    out = (jnp.moveaxis(h_seq, 0, 1), (c_fin, h_fin.astype(h0.dtype)))
    return out, (x, z_seq, c_seq, h_seq, c0, h0)


def _lstm_seq_fwd(params, x, state):
    out, res = _apply_fwd(params, x, state)
    return out, (params, res)


def _lstm_seq_bwd(resids, ct):
    params, (x, z_seq, c_seq, h_seq, c0, h0) = resids
    dout_seq, (dc_fin, dh_fin) = ct
    B, T, F = x.shape
    H4 = params["wh"].shape[1]
    H = H4 // 4
    P = params["wp"].shape[1]
    dtype = params["wh"].dtype

    # Cotangent on the final h folds into the last timestep's output grad.
    # The final-c cotangent is ignored: training discards the state and
    # decoding never differentiates, so it is always zeros here.
    dout = jnp.moveaxis(dout_seq, 1, 0).astype(dtype)  # [T,B,P]
    dout = dout.at[T - 1].add(dh_fin.astype(dtype))
    del dc_fin

    whT = params["wh"].T
    wpT = params["wp"].T
    dz_seq, dhtot_seq, dh0, dc0 = _bwd_call(
        z_seq, c_seq, c0.astype(jnp.float32), dout, whT, wpT,
        Bt=_pick_bt(B), dtype=dtype)

    # weight/bias/input grads as big MXU matmuls
    dz_flat = dz_seq.reshape(T * B, H4)
    x_flat = jnp.moveaxis(x, 1, 0).reshape(T * B, F).astype(dtype)
    h_prev = jnp.concatenate([h0.astype(dtype)[None], h_seq[:-1]], 0)
    hid_seq = (jax.nn.sigmoid(z_seq[..., 3 * H:4 * H].astype(jnp.float32))
               * jnp.tanh(c_seq.astype(jnp.float32))).astype(dtype)

    dwx = jnp.dot(x_flat.T, dz_flat, preferred_element_type=jnp.float32)
    dwh = jnp.dot(h_prev.reshape(T * B, P).T, dz_flat,
                  preferred_element_type=jnp.float32)
    dwp = jnp.dot(hid_seq.reshape(T * B, H).T,
                  dhtot_seq.reshape(T * B, P),
                  preferred_element_type=jnp.float32)
    dbias = jnp.sum(dz_flat.astype(jnp.float32), axis=0)
    dx = jnp.moveaxis(
        jnp.dot(dz_flat, params["wx"].T.astype(dtype),
                preferred_element_type=jnp.float32).reshape(T, B, F), 0, 1)

    dparams = {
        "wx": dwx.astype(params["wx"].dtype),
        "wh": dwh.astype(params["wh"].dtype),
        "wp": dwp.astype(params["wp"].dtype),
        "bias": dbias.astype(params["bias"].dtype),
    }
    dstate = (dc0, dh0.astype(h0.dtype))
    return dparams, dx.astype(x.dtype), dstate


lstm_seq.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)
