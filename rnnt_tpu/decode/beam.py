"""Transducer beam-search decoding, batched and jit-able.

The reference has greedy decoding only (utils/decoding.py); beam search is a
driver north-star config (BASELINE.json config #3).  This is the standard
breadth-first transducer beam search (the torchaudio/"modified Graves"
variant): at every encoder frame, each of the K hypotheses either emits blank
(advance to the next frame, score += blank logprob) or emits a label
(score += label logprob, pred-net state advances), expansions capped at
`expansions_per_frame`; after each frame the global top-K survive.

TPU-first layout: hypotheses live as a [B, K, ...] SoA pytree — pred-net
states [B*K, ...], token buffers [B, K, L] — so every step is a batched
matmul over B*K lattice cells; top-K is `jax.lax.top_k` over the K*(V_keep+1)
candidate scores.  No Python loops over hypotheses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rnnt_tpu.models.transducer import Transducer

NEG = -1e30


def _flat(tree):
    return jax.tree_util.tree_map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)


def _unflat(tree, B, K):
    return jax.tree_util.tree_map(lambda x: x.reshape((B, K) + x.shape[1:]), tree)


def _gather_beam(tree, idx):
    """tree leaves [B, K, ...] gathered along K with idx [B, K']."""
    def g(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)
    return jax.tree_util.tree_map(g, tree)


def beam_search_encoded(
    model: Transducer,
    params,
    encoded: jnp.ndarray,           # [B, T', P]
    enc_lengths: jnp.ndarray,       # [B]
    *,
    beam_width: int = 4,
    max_output_length: int = 200,
    expansions_per_frame: int = 3,
    prune_vocab: int = 16,
):
    """Returns (tokens [B, max_output_length], lengths [B], scores [B, K]).

    prune_vocab: per-expansion only the top-`prune_vocab` labels compete for
    beam slots (scores are exact for survivors; standard beam pruning).
    """
    cfg = model.cfg
    B, T, _ = encoded.shape
    K = beam_width
    Vk = min(prune_vocab, cfg.vocab_size - 1)
    L = max_output_length

    # hyp state (SoA): scores [B,K], tokens [B,K,L], lengths [B,K],
    # pred-net output [B,K,P] and state [B,K,...]
    pred_state0 = model.prediction_zero_state(B * K, encoded.dtype)
    pred_out0, pred_state0 = model.predict_step(
        params, jnp.zeros((B * K,), jnp.int32), pred_state0)
    P = pred_out0.shape[-1]

    scores = jnp.full((B, K), NEG).at[:, 0].set(0.0)  # only hyp 0 live at start
    tokens = jnp.zeros((B, K, L), jnp.int32)
    lengths = jnp.zeros((B, K), jnp.int32)
    pred_out = pred_out0.reshape(B, K, P)
    pred_state = _unflat(pred_state0, B, K)

    def frame_body(t, carry):
        scores, tokens, lengths, pred_out, pred_state = carry
        enc_t = encoded[:, t, :]                       # [B, P]
        frame_valid = t < enc_lengths                  # [B]

        # expansion loop within the frame: some hyps keep emitting labels,
        # ones that took blank are "settled" for this frame.
        def exp_body(e, ec):
            (scores, tokens, lengths, pred_out, pred_state,
             settled, settled_scores) = ec
            # joint over all B*K cells
            logits = model.joint_step(
                params,
                jnp.repeat(enc_t, K, axis=0),          # [B*K, P]
                pred_out.reshape(B * K, P))
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, -1)

            blank_lp = logp[..., 0]                    # [B, K]
            # settle via blank: hyp stops expanding this frame
            new_settled_scores = jnp.where(
                settled, settled_scores,
                jnp.maximum(settled_scores, scores + blank_lp))
            # (max over multiple blank paths into the same prefix this frame)

            lab_lp, lab_ids = jax.lax.top_k(logp[..., 1:], Vk)  # [B,K,Vk]
            lab_ids = lab_ids + 1
            cand_scores = jnp.where(
                settled[..., None] | (lengths >= L)[..., None],
                NEG, scores[..., None] + lab_lp)       # [B, K, Vk]

            # pick top-K label expansions across all hyps
            flat = cand_scores.reshape(B, K * Vk)
            top_scores, top_idx = jax.lax.top_k(flat, K)  # [B, K]
            src_hyp = top_idx // Vk                    # [B, K]
            src_lab = jnp.take_along_axis(
                lab_ids.reshape(B, K * Vk), top_idx, axis=1)  # [B, K]

            # gather parent hyp state
            new_tokens = _gather_beam(tokens[..., None], src_hyp)[..., 0] \
                if False else jnp.take_along_axis(
                    tokens, src_hyp[..., None], axis=1)
            new_lengths = jnp.take_along_axis(lengths, src_hyp, axis=1)
            new_pred_out = jnp.take_along_axis(
                pred_out, src_hyp[..., None], axis=1)
            new_pred_state = _gather_beam(pred_state, src_hyp)

            # append label
            slot = jnp.minimum(new_lengths, L - 1)
            new_tokens = jnp.where(
                (top_scores > NEG / 2)[..., None]
                & (jax.lax.broadcasted_iota(jnp.int32, (B, K, L), 2)
                   == slot[..., None]),
                src_lab[..., None], new_tokens)
            emit_ok = top_scores > NEG / 2
            new_lengths = new_lengths + emit_ok.astype(jnp.int32)

            # advance pred net for the emitted labels
            adv_out, adv_state = model.predict_step(
                params, src_lab.reshape(B * K), _flat(new_pred_state))
            adv_out = adv_out.reshape(B, K, P)
            adv_state = _unflat(adv_state, B, K)
            new_pred_out = jnp.where(emit_ok[..., None], adv_out, new_pred_out)
            new_pred_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    emit_ok.reshape((B, K) + (1,) * (a.ndim - 2)), a, b),
                adv_state, new_pred_state)

            # frames beyond enc_length: freeze everything
            keep = ~frame_valid
            def frz(new, old):
                return jnp.where(keep.reshape((B,) + (1,) * (new.ndim - 1)),
                                 old, new)
            return (frz(top_scores, scores), frz(new_tokens, tokens),
                    frz(new_lengths, lengths), frz(new_pred_out, pred_out),
                    jax.tree_util.tree_map(frz, new_pred_state, pred_state),
                    frz(jnp.zeros_like(settled), settled),
                    frz(new_settled_scores, settled_scores))

        settled0 = jnp.zeros((B, K), bool)
        settled_scores0 = jnp.full((B, K), NEG)
        (exp_scores, exp_tokens, exp_lengths, exp_pred_out, exp_pred_state,
         _, settled_scores) = jax.lax.fori_loop(
            0, expansions_per_frame, exp_body,
            (scores, tokens, lengths, pred_out, pred_state,
             settled0, settled_scores0))

        # after expansions: merge "settled" (blank-taken) hypotheses with the
        # final expanded set; settled ones carry the ORIGINAL prefix states.
        all_scores = jnp.concatenate([settled_scores, exp_scores + NEG], 1)
        # expanded-but-never-blanked hyps must still take a blank to move to
        # the next frame — handled by adding their blank lp:
        logits = model.joint_step(
            params, jnp.repeat(enc_t, K, axis=0),
            exp_pred_out.reshape(B * K, P))
        blank_lp = jax.nn.log_softmax(logits, -1).reshape(B, K, -1)[..., 0]
        all_scores = jnp.concatenate(
            [settled_scores, exp_scores + blank_lp], axis=1)  # [B, 2K]

        all_tokens = jnp.concatenate([tokens, exp_tokens], 1)
        all_lengths = jnp.concatenate([lengths, exp_lengths], 1)
        all_pred_out = jnp.concatenate([pred_out, exp_pred_out], 1)
        all_pred_state = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], 1), pred_state, exp_pred_state)

        top_scores, top_idx = jax.lax.top_k(all_scores, K)
        new_tokens = jnp.take_along_axis(all_tokens, top_idx[..., None], 1)
        new_lengths = jnp.take_along_axis(all_lengths, top_idx, 1)
        new_pred_out = jnp.take_along_axis(all_pred_out, top_idx[..., None], 1)
        new_pred_state = _gather_beam(all_pred_state, top_idx)

        def frz(new, old):
            return jnp.where(
                (~frame_valid).reshape((B,) + (1,) * (new.ndim - 1)), old, new)
        return (frz(top_scores, scores), frz(new_tokens, tokens),
                frz(new_lengths, lengths), frz(new_pred_out, pred_out),
                jax.tree_util.tree_map(frz, new_pred_state, pred_state))

    carry = (scores, tokens, lengths, pred_out, pred_state)
    scores, tokens, lengths, pred_out, pred_state = jax.lax.fori_loop(
        0, T, frame_body, carry)

    # best hypothesis = index 0 after the last top_k (scores sorted desc)
    best_tokens = tokens[:, 0, :]
    best_lengths = lengths[:, 0]
    return best_tokens, best_lengths, scores


def beam_search_decode(
    model: Transducer,
    params,
    mel_specs: jnp.ndarray,
    spec_lengths: Optional[jnp.ndarray] = None,
    *,
    beam_width: int = 4,
    max_output_length: int = 200,
):
    B, T, _ = mel_specs.shape
    if spec_lengths is None:
        spec_lengths = jnp.full((B,), T, jnp.int32)
    encoded, _ = model.encode(params, mel_specs)
    enc_lengths = model.encoded_length(spec_lengths)
    return beam_search_encoded(
        model, params, encoded, enc_lengths, beam_width=beam_width,
        max_output_length=max_output_length)
