"""Data layer: tokenizers, corpus adapters, record shards, batching."""

from rnnt_tpu.data.tokenizer import (  # noqa: F401
    CharTokenizer,
    SubwordTokenizer,
    get_tokenizer,
    normalize_text,
)
