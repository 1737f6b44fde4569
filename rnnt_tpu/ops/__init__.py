"""Compute ops: RNN-T loss (reference + Pallas TPU kernel) and the audio
frontend.

Import from the submodules directly (function names intentionally mirror
their module names, so no re-exports here — they would shadow the modules):

    from rnnt_tpu.ops.rnnt_loss import rnnt_loss          # dispatcher
    from rnnt_tpu.ops.rnnt_loss_ref import rnnt_loss_ref  # pure-JAX
    from rnnt_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas
    from rnnt_tpu.ops import features
"""
