"""Transducer decoding: greedy, beam search, streaming (ref: utils/decoding.py)."""

from rnnt_tpu.decode.greedy import greedy_decode  # noqa: F401
