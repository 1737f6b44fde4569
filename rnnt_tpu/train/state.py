"""Train state: params + optimizer state + step, as one pytree.

Improves on the reference checkpoints which stored weights only (HDF5,
run_rnnt.py:326-329) and silently reset optimizer momentum and global_step on
resume (run_rnnt.py:336 — SURVEY.md §5 checkpoint quirk).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rnnt_tpu.config import RNNTConfig
from rnnt_tpu.models.transducer import init_transducer_params


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any                # transducer param pytree (incl. batchnorm stats)
    opt_state: Any             # optax state (SGD momentum buffers)


def lr_schedule(cfg: RNNTConfig):
    """Step -> learning-rate schedule (optax callable).

    The reference trains at a constant lr (run_rnnt.py:483-484) and that
    stays the default; `warmup_steps` / `lr_schedule="cosine"` are the
    knobs deep LSTM stacks need at parity scale — gradient norms are 1-2
    orders of magnitude above the clip threshold for the first few hundred
    steps, so a constant lr must be set for the *transient*, not the
    steady state.  Warmup removes that compromise.
    """
    if cfg.lr_schedule == "cosine" and cfg.decay_steps > 0:
        base = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.decay_steps, alpha=cfg.lr_final_factor)
    elif cfg.lr_schedule not in ("constant", "cosine"):
        raise ValueError(f"lr_schedule={cfg.lr_schedule!r} "
                         "(want 'constant' or 'cosine')")
    else:
        base = optax.constant_schedule(cfg.learning_rate)
    if cfg.warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
             base],
            [cfg.warmup_steps])
    return base


def make_optimizer(cfg: RNNTConfig) -> optax.GradientTransformation:
    """SGD + momentum at the reference's settings (run_rnnt.py:483-484),
    optionally under a warmup/cosine lr schedule (`lr_schedule`).

    optimizer="adam" is a beyond-ref option: per-parameter adaptive scaling
    is what actually trains the 8-layer stack at parity scale — measured on
    the synthetic campaign, SGD+momentum leaves the encoder nearly frozen
    (2% parameter movement over 4k steps vs 37-52% for pred/joint: the
    blank-dominated lattice starves encoder gradients relative to the
    LM-ish pred/joint path, and a global lr can't serve both)."""
    if cfg.optimizer == "adam":
        # mu in fp32 even under bf16 params: the first moment is a small
        # signal accumulated across steps — bf16 rounding there visibly
        # hurts; nu tolerates bf16 (range, not mantissa, is what sqrt needs)
        tx = [optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9,
                                  mu_dtype=jnp.float32)]
    elif cfg.optimizer == "sgd":
        tx = [optax.trace(decay=cfg.momentum, nesterov=False)]
    else:
        raise ValueError(f"optimizer={cfg.optimizer!r} (want 'sgd' or 'adam')")
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        tx.insert(0, optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.warmup_steps > 0 or cfg.lr_schedule != "constant":
        # schedule state adds one replicated count leaf to opt_state; the
        # plain-constant path keeps the exact round-1 checkpoint layout
        sched = lr_schedule(cfg)
        tx.append(optax.scale_by_schedule(lambda t: -sched(t)))
    else:
        tx.append(optax.scale(-cfg.learning_rate))
    return optax.chain(*tx)


def create_train_state(key, cfg: RNNTConfig, dtype=None) -> TrainState:
    """dtype=None derives the parameter dtype from cfg.compute_dtype."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params = init_transducer_params(key, cfg, dtype)
    tx = make_optimizer(cfg)
    opt_state = tx.init(_trainable(params))
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state)


def _trainable(params):
    """Mask out batchnorm running stats (non-trainable leaves)."""
    bn = dict(params["encoder"]["bn"])
    bn.pop("mean"), bn.pop("var")
    out = {
        "encoder": {**params["encoder"], "bn": bn},
        "prediction": params["prediction"],
        "joint": params["joint"],
    }
    return out


def merge_trainable(params, trainable):
    """Inverse of `_trainable`: put updated trainables back with the stats."""
    bn = dict(trainable["encoder"]["bn"])
    bn["mean"] = params["encoder"]["bn"]["mean"]
    bn["var"] = params["encoder"]["bn"]["var"]
    return {
        "encoder": {**trainable["encoder"], "bn": bn},
        "prediction": trainable["prediction"],
        "joint": trainable["joint"],
    }


trainable = _trainable
