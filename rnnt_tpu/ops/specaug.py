"""SpecAugment: frequency + time masking on stacked log-mel features.

Beyond-reference augmentation (the reference's only augmentation hook is
Gaussian input noise, run_rnnt.py:241-242); standard for RNN-T training
since Park et al. 2019.  Operates directly on the STACKED feature layout
the pipeline produces ([B, T, mel_bins * downsample_factor], see
utils/preprocessing.py:84-94 for the reference's stacking): a frequency
mask removes the same mel bin from every stacked copy, so masking is
consistent with the unstacked spectrogram; a time mask removes whole
stacked frames (= `downsample_factor` original hops), confined to the
real (unpadded) extent of each utterance.

Fully vectorized and jit-safe: mask widths/starts are sampled per example
per mask with `jax.random`, masks are built by broadcast comparisons
(no dynamic shapes).  Masked cells are set to 0 — the features are
per-bin mean-subtracted upstream, so 0 is the corpus mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interval_mask(key, n_pos: int, batch: int, n_masks: int, max_width: int,
                   limit=None):
    """[B, n_pos] boolean: True where any of `n_masks` random intervals
    covers the position.  Width ~ U[0, max_width]; start ~ U[0, bound-w]
    where bound is `limit` (per-example, e.g. real length) or n_pos."""
    kw, ks = jax.random.split(key)
    w = jax.random.randint(kw, (batch, n_masks), 0, max_width + 1)
    bound = (jnp.full((batch, 1), n_pos) if limit is None
             else limit.reshape(batch, 1))
    w = jnp.minimum(w, bound)
    # start in [0, bound - w] inclusive
    u = jax.random.uniform(ks, (batch, n_masks))
    start = jnp.floor(u * (bound - w + 1)).astype(jnp.int32)
    pos = jnp.arange(n_pos).reshape(1, 1, n_pos)
    covered = (pos >= start[..., None]) & (pos < (start + w)[..., None])
    return jnp.any(covered, axis=1)  # [B, n_pos]


def spec_augment(key, mel, spec_lengths, *, mel_bins: int,
                 freq_masks: int, freq_width: int,
                 time_masks: int, time_width: int):
    """Apply SpecAugment to stacked features.

    mel: [B, T, mel_bins * stack] (stack inferred from the width)
    spec_lengths: [B] real stacked-frame counts (padding is never masked —
    it is already zero and masking it would waste the time-mask budget).
    """
    B, T, FS = mel.shape
    stack = FS // mel_bins
    kf, kt = jax.random.split(key)
    keep = jnp.ones((B, T, FS), bool)
    if freq_masks > 0 and freq_width > 0:
        fmask = _interval_mask(kf, mel_bins, B, freq_masks, freq_width)
        # same mel bin masked in every stacked copy: tile across the stack
        keep &= ~jnp.tile(fmask, (1, stack))[:, None, :]
    if time_masks > 0 and time_width > 0:
        tmask = _interval_mask(kt, T, B, time_masks, time_width,
                               limit=spec_lengths.astype(jnp.int32))
        keep &= ~tmask[:, :, None]
    return jnp.where(keep, mel, jnp.zeros((), mel.dtype))
