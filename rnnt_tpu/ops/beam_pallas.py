"""Transducer beam search as a single Pallas TPU kernel.

Why: the XLA beam search (decode/beam.py) is a device while-loop whose body
is ~250 small ops (joint, pred-net step, top-k, hypothesis gathers).  On TPU
each op in a loop body carries a fixed overhead that dwarfs the actual
compute at decode batch sizes — measured 187 ms for beam-4/B=64/T'=128 at
the parity config (after frame unrolling; 494 ms before), vs ~25 ms of
essential matmul work.  This kernel: 54 ms (3.4x) on v5e.

This kernel runs the ENTIRE search on-chip in one launch:

- grid (B-blocks, T'): encoder frames stream through the second grid axis,
  the beam state (scores, token buffers, pred-net LSTM state) lives in VMEM
  scratch that persists across grid steps (same carry idiom as
  ops/lstm_pallas.py);
- ALL decode-side weights — prediction-net LSTM + embedding + joint — are
  VMEM-resident for the whole search (~55 MB at the parity config;
  `vmem_limit_bytes` is raised accordingly, the 16 MB default is only the
  compiler's conservative cap);
- every per-hypothesis quantity lives in a flat [N, .] row layout
  (N = Bt*K, row n = utterance n//K, hypothesis n%K).  Mosaic cannot shape-
  cast between sublane and lane dims, so per-utterance reductions (top-k
  across a beam) are built from sublane rolls + one-hot matmul broadcasts
  instead of reshapes; hypothesis gathers/merges are one-hot MXU matmuls
  (dynamic gathers are slow on TPU).

Algorithm: "modified" breadth-first transducer beam search with a static
number E of label expansions per frame (equals decode/beam.py:
beam_search_encoded with expansions_per_frame=E, prune_vocab >= beam_width —
including the incremental duplicate-prefix merge, merge_duplicates=True
default on both backends).  Per frame:

  expanding = beam; logp = log_softmax(joint(enc_t, expanding))   # [N, V]
  settled   = expanding scores + blank logp            # settle in place
  repeat E times (python-unrolled, E static):
      labels    = top-K over each utterance's K x V extensions of
                  `expanding`; append token, advance pred net
      logp      = joint logp of the advanced set
      advanced  = expanding + blank logp               # blank-settled copy
      merge     = logaddexp advanced rows whose token prefix equals a
                  settled row into that row (Graves 2012: prefix prob sums
                  over alignments), kill the advanced copy
      settled   = top-K over settled ∪ advanced
                  (incremental fold — keeps only 2 state sets live in VMEM
                  regardless of E)
  beam = settled

E must cover the model's emission burstiness: with small subword vocabs a
single acoustic event can emit 5+ pieces in one frame, and an E too small
force-settles mid-burst into a low-probability region (measured on the
synthetic corpus: E=1 WER 0.267, E=3 0.151, E=6 0.061 vs greedy 0.090).

The reference has no beam search at all (utils/decoding.py is greedy-only);
this is BASELINE.json config #3 made production-fast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_BIG = 2 ** 30  # sentinel index, larger than any real row/column


def _interpret_default() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _onehot_rows(col, m: int, dtype):
    """col [N, 1] i32 -> one-hot [N, m]."""
    n = col.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return (iota == col).astype(dtype)


def _sel(mat, col):
    """Row-gather mat [M, F] by col [N, 1] -> [N, F] f32 via one-hot matmul
    (exact for i32 payloads < 2^24 cast through f32).

    f32 payloads MUST multiply at HIGHEST precision: the TPU MXU's DEFAULT
    f32 precision truncates inputs to bf16, which silently rounds scores
    and corrupts integer payloads > 256 (token ids, concat-row indices).
    bf16 payloads are single-pass exact at DEFAULT already.
    """
    dt = mat.dtype if mat.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    oh = _onehot_rows(col, mat.shape[0], dt)
    return jnp.dot(oh, mat.astype(dt), preferred_element_type=jnp.float32,
                   precision=prec)


def _sel_i32(mat, col):
    return _sel(mat, col).astype(jnp.int32)


def _layer_norm(h, scale, bias, eps=1e-3):
    """Matches models.lstm.layer_norm (Keras eps=1e-3), f32 in/out."""
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _group_topk(vals, K: int, row_idx, base_col):
    """Per-utterance top-K over a [N, C] candidate matrix.

    Rows n = b*K + k belong to utterance b; every one of an utterance's N_b =
    K rows x C lanes cells competes.  Returns per-slot results broadcast to
    the utterance's rows in slot layout: (scores [N,1] f32 — slot n%K holds
    the (n%K)-th best, winner-row [N,1] i32 — global row of the winning
    hypothesis, winner-lane [N,1] i32).

    Reductions across an utterance's K rows use sublane rolls (only the k=0
    row of each group sees the true reduction, which is then broadcast back
    with a one-hot matmul via `base_col` = (n//K)*K).  Ties pick the lowest
    lane, then the lowest row — jax.lax.top_k order over a [pool0|pool1]
    concatenation.
    """
    N, C = vals.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)
    slot = row_idx - base_col  # n % K

    def grp_bcast(x, reduce_fn):
        m = x
        for s in range(1, K):
            # cyclic up-shift by s (pltpu.roll needs non-negative shifts)
            m = reduce_fn(m, pltpu.roll(x, N - s, axis=0))
        return _sel(m, base_col)  # valid at k=0 rows -> broadcast to group

    out_sc = jnp.zeros((N, 1), jnp.float32)
    out_row = jnp.zeros((N, 1), jnp.int32)
    out_lane = jnp.zeros((N, 1), jnp.int32)
    work = vals
    for k in range(K):
        r = jnp.max(work, axis=1, keepdims=True)                   # [N,1]
        la = jnp.min(jnp.where(work >= r, lane, _BIG), axis=1,
                     keepdims=True)                                # [N,1]
        g = grp_bcast(r, jnp.maximum)                              # [N,1]
        wr = grp_bcast(jnp.where(r >= g, row_idx, _BIG),
                       jnp.minimum).astype(jnp.int32)              # [N,1]
        law = _sel_i32(la, wr)                                     # [N,1]
        is_k = slot == k
        out_sc = jnp.where(is_k, g, out_sc)
        out_row = jnp.where(is_k, wr, out_row)
        out_lane = jnp.where(is_k, law, out_lane)
        work = jnp.where((row_idx == wr) & (lane == law), NEG, work)
    return out_sc, out_row, out_lane


def _beam_kernel(*refs, n_layers, Bt, K, L, Vp, nT, dt, E, merge):
    """One grid step = one encoder frame for one B-block.

    Ref order: enc, enc_len, init_scores, init_pred,
               (init_c_l, init_h_l) * n_layers,
               embed, (wcat_l, bias_l, wp_l, ln_s_l, ln_b_l) * n_layers,
               jw1, jb1, jw2, jb2
               | outs: tokens, lengths, scores
               | scratch: sc_scores, sc_len, sc_tokens, sc_pred,
                          (sc_c_l, sc_h_l) * n_layers
    """
    it = iter(refs)
    enc_ref = next(it)
    enclen_ref = next(it)
    init_scores_ref = next(it)
    init_pred_ref = next(it)
    init_state_refs = [(next(it), next(it)) for _ in range(n_layers)]
    embed_ref = next(it)
    layer_refs = [tuple(next(it) for _ in range(5)) for _ in range(n_layers)]
    jw1_ref, jb1_ref, jw2_ref, jb2_ref = (next(it) for _ in range(4))
    tok_out, len_out, sc_out = (next(it) for _ in range(3))
    sc_scores, sc_len, sc_tokens, sc_pred = (next(it) for _ in range(4))
    sc_states = [(next(it), next(it)) for _ in range(n_layers)]

    N = Bt * K
    t = pl.program_id(1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    base_col = (row_idx // K) * K   # first row of this row's utterance group

    @pl.when(t == 0)
    def _():
        sc_scores[...] = init_scores_ref[...]
        sc_len[...] = jnp.zeros((N, 1), jnp.int32)
        sc_tokens[...] = jnp.zeros((N, L), jnp.int32)
        sc_pred[...] = init_pred_ref[...]
        for (c_ref, h_ref), (ic, ih) in zip(sc_states, init_state_refs):
            c_ref[...] = ic[...]
            h_ref[...] = ih[...]

    # ---- frame inputs -------------------------------------------------
    f = enc_ref[0]                                        # [Bt, P] dt
    f_rep = _sel(f, row_idx // K).astype(dt)              # [N, P]
    fj = (jnp.dot(f_rep, jw1_ref[...], preferred_element_type=jnp.float32)
          + jb1_ref[...].astype(jnp.float32))             # [N, J]

    def joint_logp(pred_dt):
        """log_softmax(joint(enc_t, pred)) -> [N, Vp] f32.  Padded vocab
        columns carry b2 = -1e9 from the wrapper, so they contribute ~0 to
        the logsumexp and can never win a top-k."""
        g = jnp.dot(pred_dt, jw1_ref[...],
                    preferred_element_type=jnp.float32)
        h = jnp.tanh(fj + g).astype(dt)
        logits = (jnp.dot(h, jw2_ref[...],
                          preferred_element_type=jnp.float32)
                  + jb2_ref[...].astype(jnp.float32))     # [N, Vp]
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        return logits - m - lse

    # Hypothesis sets are dicts of VALUES (not refs): scores [N,1] f32,
    # len [N,1] i32, tok [N,L] i32, pred [N,P] dt, states [(c f32, h dt)].
    def pred_advance(lab, state_p):
        """Embed `lab` -> n_layers x {LSTM step, LN} from `state_p`."""
        ohv = _onehot_rows(lab, Vp, dt)                   # [N, Vp]
        x = jnp.dot(ohv, embed_ref[...],
                    preferred_element_type=jnp.float32)   # [N, E]
        state_adv = []
        for (wcat, bias, wp, ln_s, ln_b), (c_p, h_p) in zip(layer_refs,
                                                            state_p):
            xh = jnp.concatenate([x.astype(dt), h_p], axis=1)
            z = (jnp.dot(xh, wcat[...], preferred_element_type=jnp.float32)
                 + bias[...].astype(jnp.float32))         # [N, 4H]
            H = z.shape[1] // 4
            i_, g_, f_, o_ = (z[:, 0:H], z[:, H:2 * H],
                              z[:, 2 * H:3 * H], z[:, 3 * H:4 * H])
            c_new = (jax.nn.sigmoid(f_) * c_p
                     + jax.nn.sigmoid(i_) * jnp.tanh(g_))  # f32
            hid = jax.nn.sigmoid(o_) * jnp.tanh(c_new)
            h_new = jnp.dot(hid.astype(dt), wp[...],
                            preferred_element_type=jnp.float32)
            state_adv.append((c_new, h_new.astype(dt)))
            x = _layer_norm(h_new, ln_s[...].astype(jnp.float32),
                            ln_b[...].astype(jnp.float32))
        return x.astype(dt), state_adv                    # post-LN [N, P]

    # The SETTLED pool lives in the scratch refs (sc_*) and is updated in
    # place after every expansion — keeping it in SSA values made the
    # register allocator spill ~84 MB of vregs across the unrolled E loop.
    # Only the EXPANDING set is carried as values.
    alive = t < enclen_ref[...]                           # [N, 1]
    expanding = dict(
        sc=sc_scores[...], ln=sc_len[...], tok=sc_tokens[...],
        pred=sc_pred[...], st=[(c[...], h[...]) for c, h in sc_states])
    logp = joint_logp(expanding["pred"])                  # [N, Vp]
    # settle the current beam in place (blank move, state unchanged)
    sc_scores[...] = jnp.where(alive, expanding["sc"] + logp[:, 0:1],
                               expanding["sc"])

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (N, Vp), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    for _ in range(E):
        # ---- label expansion: top-K over each utterance's K x V moves ----
        cand = expanding["sc"] + logp                     # [N, Vp]
        cand = jnp.where(col_iota == 0, NEG, cand)        # blank not a label
        cand = jnp.where(expanding["ln"] >= L, NEG, cand)  # length cap
        wsc, wrow, lab = _group_topk(cand, K, row_idx, base_col)
        # slot layout: row n holds the (n%K)-th best (score, parent, label)

        tok_p = _sel_i32(expanding["tok"], wrow)          # [N, L]
        len_p = _sel_i32(expanding["ln"], wrow)           # [N, 1]
        state_p = [(_sel(c, wrow), _sel(h, wrow).astype(dt))
                   for c, h in expanding["st"]]
        tok_adv = jnp.where(l_iota == len_p, lab, tok_p)
        len_adv = len_p + 1
        pred_adv, state_adv = pred_advance(lab, state_p)
        expanding = dict(sc=wsc, ln=len_adv, tok=tok_adv, pred=pred_adv,
                         st=state_adv)

        # ---- settle the advanced set with one blank move, merge ---------
        # (dead frames keep the old pool: mrow=self, mlane=0)
        logp = joint_logp(pred_adv)
        blanked_sc = wsc + logp[:, 0:1]

        if merge:
            # ---- prefix-merge the advanced set into the settled pool ----
            # (Graves 2012: a prefix's probability sums over its alignments;
            # identical algorithm to decode/beam.py _merge_adv_into_settled.)
            # Settled and advanced pools are each internally duplicate-free,
            # so each advanced row matches at most one settled row of its
            # utterance.  Pairwise row comparison across the K-row group is
            # a sublane roll (settled row n vs advanced row n+s), valid
            # while slot n%K + s stays inside the group; the merged mass
            # lands on the settled copy and the advanced copy is killed.
            sl_sc = sc_scores[...]
            sl_len = sc_len[...]
            sl_tok = sc_tokens[...]
            slot = row_idx - base_col
            merged_sc = sl_sc
            kill = jnp.zeros((N, 1), jnp.int32)
            for s in range(-(K - 1), K):
                sh = (N - s) % N
                r_tok = pltpu.roll(tok_adv, sh, axis=0)   # row n -> adv[n+s]
                r_len = pltpu.roll(len_adv, sh, axis=0)
                r_sc = pltpu.roll(blanked_sc, sh, axis=0)
                eq = (slot + s >= 0) & (slot + s < K)
                eq &= r_len == sl_len
                # count mismatches in int32 instead of jnp.all over a bool
                # vector: Mosaic lowers the [N, L] i1 reduce via an i8->i1
                # trunci that is unsupported at non-lane-aligned L (seen at
                # L=104 = 2*pad_tokens+8 on v5e: "Unsupported target
                # bitwidth for truncation")
                mism = jnp.sum(
                    jnp.where(l_iota < sl_len,
                              (r_tok != sl_tok).astype(jnp.int32), 0),
                    axis=1, keepdims=True)
                eq &= mism == 0
                eq &= (sl_sc > NEG / 2) & (r_sc > NEG / 2) & alive
                mx = jnp.maximum(merged_sc, r_sc)
                mn = jnp.minimum(merged_sc, r_sc)
                merged_sc = jnp.where(
                    eq, mx + jnp.log1p(jnp.exp(mn - mx)), merged_sc)
                kill |= pltpu.roll(eq.astype(jnp.int32), s % N, axis=0)
            sc_scores[...] = merged_sc
            blanked_sc = jnp.where(kill > 0, NEG, blanked_sc)

        pool = jnp.concatenate([sc_scores[...], blanked_sc], 1)  # [N, 2]
        msc, mrow, mlane = _group_topk(pool, K, row_idx, base_col)
        msc = jnp.where(alive, msc, sc_scores[...])
        mrow = jnp.where(alive, mrow, row_idx)
        mlane = jnp.where(alive, mlane, 0)
        colm = mrow + mlane * N  # rows into concat(settled, expanding)

        def merge(a, b, colm=colm):
            return _sel(jnp.concatenate([a, b], axis=0), colm)

        sc_scores[...] = msc
        sc_len[...] = merge(sc_len[...].astype(jnp.float32),
                            len_adv.astype(jnp.float32)).astype(jnp.int32)
        sc_tokens[...] = merge(sc_tokens[...].astype(jnp.float32),
                               tok_adv.astype(jnp.float32)).astype(jnp.int32)
        sc_pred[...] = merge(sc_pred[...], pred_adv).astype(dt)
        for (c_ref, h_ref), (c_a, h_a) in zip(sc_states, state_adv):
            c_ref[...] = merge(c_ref[...], c_a)
            h_ref[...] = merge(h_ref[...], h_a).astype(dt)

    @pl.when(t == nT - 1)
    def _():
        tok_out[...] = sc_tokens[...]
        len_out[...] = sc_len[...]
        sc_out[...] = sc_scores[...]


def beam_search_encoded_pallas(
    model,
    params,
    encoded: jnp.ndarray,           # [B, T', P]
    enc_lengths: jnp.ndarray,       # [B]
    *,
    beam_width: int = 4,
    max_output_length: int = 200,
    expansions_per_frame: int = 1,
    merge_duplicates: bool = True,
    interpret=None,
):
    """On-chip beam search from encoder activations.

    Returns (best tokens [B, L], best lengths [B], beam scores [B, K]) —
    same contract (including the incremental duplicate-prefix merge,
    merge_duplicates=True default) as decode.beam.beam_search_encoded;
    see module docstring on expansions_per_frame.
    """
    cfg = model.cfg
    dt = params["joint"]["w1"].dtype
    B, T, P = encoded.shape
    K = beam_width
    L = max_output_length
    V = cfg.vocab_size
    Vp = _round_up(V, 128)
    n_layers = cfg.pred_net_layers
    H = cfg.pred_net_size

    # B-block size: [N, Vp]-sized per-expansion temporaries stay live across
    # the unrolled E loop, so shrink the block as E grows to fit VMEM
    # (parity config measured: E=3 at Bt=64 wants 145 MB > 128 MB).
    bt_cap = 64 if expansions_per_frame <= 2 else (
        32 if expansions_per_frame <= 4 else 16)
    Bt = B if B <= bt_cap else bt_cap
    # Mosaic requires the flat hypothesis dim N = Bt*K to cover a full f32
    # sublane tile (8): B=1/K=4 gave N=4, which failed Mosaic lowering at
    # exactly the shape serving uses (round-4 finding; B>=2 — N>=8 — always
    # compiled).  Pad the batch up; padded utterances carry enc_length 0, so
    # their beams are inert (`alive` is false every frame) and the pad is
    # sliced off before returning.
    Bt = max(Bt, -(-8 // K))
    pad_b = (-B) % Bt
    if pad_b:
        encoded = jnp.pad(encoded, ((0, pad_b), (0, 0), (0, 0)))
        enc_lengths = jnp.pad(enc_lengths, (0, pad_b))  # len 0: beam inert
    Bp = B + pad_b
    nB = Bp // Bt
    N = Bt * K

    # initial beam: pred net fed the start token 0 (decoding.py:28)
    pred_state0 = model.prediction_zero_state(Bp * K, dt)
    pred_out0, pred_state0 = model.predict_step(
        params, jnp.zeros((Bp * K,), jnp.int32), pred_state0)
    init_scores = jnp.full(
        (Bp, K), NEG, jnp.float32).at[:, 0].set(0.0).reshape(Bp * K, 1)
    enc_len_rep = jnp.repeat(
        enc_lengths.astype(jnp.int32), K).reshape(Bp * K, 1)

    pp = params["prediction"]
    jp = params["joint"]
    embed = pp["embed"]
    if Vp != V:
        embed = jnp.pad(embed, ((0, Vp - V), (0, 0)))
    jw2 = jp["w2"]
    jb2 = jp["b2"].astype(jnp.float32)
    if Vp != V:
        jw2 = jnp.pad(jw2, ((0, 0), (0, Vp - V)))
        jb2 = jnp.pad(jb2, (0, Vp - V), constant_values=-1e9)

    layer_args = []
    for lyr in pp["layers"]:
        lp = lyr["lstm"]
        layer_args += [
            jnp.concatenate([lp["wx"], lp["wh"]], axis=0).astype(dt),
            lp["bias"].astype(jnp.float32)[None, :],          # [1, 4H]
            lp["wp"].astype(dt),                              # [H, P]
            lyr["ln"]["scale"][None, :],
            lyr["ln"]["bias"][None, :],
        ]

    state_args = []
    for c0, h0 in pred_state0:
        state_args += [c0.astype(jnp.float32), h0.astype(dt)]

    kernel = functools.partial(
        _beam_kernel, n_layers=n_layers, Bt=Bt, K=K, L=L, Vp=Vp, nT=T, dt=dt,
        E=expansions_per_frame, merge=merge_duplicates)

    const = lambda shape: pl.BlockSpec(  # noqa: E731  (fetched once)
        shape, lambda ib, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    per_ib = lambda shape: pl.BlockSpec(  # noqa: E731  (per B-block)
        shape, lambda ib, t: (ib,) + tuple(0 for _ in shape[1:]),
        memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, Bt, P), lambda ib, t: (t, ib, 0),
                     memory_space=pltpu.VMEM),               # enc
        per_ib((N, 1)),                                      # enc_len (xK)
        per_ib((N, 1)),                                      # init scores
        per_ib((N, P)),                                      # init pred_out
    ]
    for _ in range(n_layers):
        in_specs += [per_ib((N, H)), per_ib((N, P))]         # init c, h
    in_specs.append(const((Vp, embed.shape[1])))             # embed
    for lyr in pp["layers"]:
        F4 = lyr["lstm"]["wx"].shape[0] + P
        H4 = lyr["lstm"]["wx"].shape[1]
        in_specs += [const((F4, H4)), const((1, H4)),
                     const((H, P)), const((1, P)), const((1, P))]
    J = jp["w1"].shape[1]
    in_specs += [const((P, J)), const((1, J)),
                 const((J, Vp)), const((1, Vp))]

    out_specs = [per_ib((N, L)), per_ib((N, 1)), per_ib((N, 1))]
    out_shape = [
        jax.ShapeDtypeStruct((Bp * K, L), jnp.int32),
        jax.ShapeDtypeStruct((Bp * K, 1), jnp.int32),
        jax.ShapeDtypeStruct((Bp * K, 1), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((N, 1), jnp.float32),    # scores
        pltpu.VMEM((N, 1), jnp.int32),      # lengths
        pltpu.VMEM((N, L), jnp.int32),      # tokens
        pltpu.VMEM((N, P), dt),             # pred_out
    ]
    for _ in range(n_layers):
        scratch += [pltpu.VMEM((N, H), jnp.float32), pltpu.VMEM((N, P), dt)]

    interp = _interpret_default() if interpret is None else interpret
    tokens, lengths, scores = pl.pallas_call(
        kernel,
        grid=(nB, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interp,
    )(jnp.moveaxis(encoded, 1, 0).astype(dt),
      enc_len_rep,
      init_scores,
      pred_out0.astype(dt),
      *state_args,
      embed.astype(dt),
      *layer_args,
      jp["w1"].astype(dt),
      jp["b1"].astype(jnp.float32)[None, :],
      jw2.astype(dt),
      jb2[None, :])

    # slot 0 of each utterance is the best hypothesis (merge sorts desc)
    tokens = tokens.reshape(Bp, K, L)
    lengths = lengths.reshape(Bp, K)
    scores = scores.reshape(Bp, K)
    return (tokens[:B, 0, :], lengths[:B, 0], scores[:B])
