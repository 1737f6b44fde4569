"""RNN-T loss dispatcher.

Single stable entry point (the role warp-transducer's C API header played,
cmake/warp-rnnt-cmakelist.txt:137 / utils/loss.py:6): picks the fused Pallas
TPU kernel on TPU backends and the pure-JAX reference elsewhere.  Both share
the convention of raw logits in, per-example NLL out (fixes ref quirk
loss.py:29-30 where the softmax convention depended on the build).
"""

from __future__ import annotations

import jax

from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_ref


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def rnnt_loss(logits, labels, logit_lengths, label_lengths, *, impl: str = "auto"):
    """Per-example RNN-T negative log-likelihood.

    Args:
      logits: [B, T, U+1, V] raw joint-network outputs (any float dtype;
        lattice math runs in fp32).
      labels: [B, U] int32 target ids (blank = 0 never appears as a label).
      logit_lengths: [B] valid encoder frames (post time-reduction).
      label_lengths: [B] valid label counts.
      impl: "auto" | "ref" | "pallas".
    """
    if impl == "ref":
        return rnnt_loss_ref(logits, labels, logit_lengths, label_lengths)
    if impl == "pallas" or (impl == "auto" and _on_tpu()):
        try:
            from rnnt_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas

            return rnnt_loss_pallas(logits, labels, logit_lengths, label_lengths)
        except ImportError:
            if impl == "pallas":
                raise
    return rnnt_loss_ref(logits, labels, logit_lengths, label_lengths)
