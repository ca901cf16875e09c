"""BERT configuration (compatible with bert_config.json files).

Field names match the Google/HF ``bert_config.json`` schema so released
configs load directly (reference `Models/Bert/modeling.py:67-153` consumes
the same file)."""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # TPU execution knobs (not part of the json schema)
    attention_impl: str = "auto"  # 'auto' (pallas on TPU) | 'xla' | 'pallas'
    dtype: str = "float32"       # compute dtype: 'float32' | 'bfloat16'
    quant: str = "none"          # 'none' | 'int8' (weight-only, ops/quant.py)
    # (dp, tp) jax.sharding.Mesh for multi-device execution. When set, the
    # Pallas attention path partitions explicitly via shard_map (batch over
    # dp, heads over tp) — GSPMD cannot partition a Pallas custom call and
    # would otherwise replicate it behind all-gathers. None = single device.
    mesh: object = None

    @classmethod
    def base_uncased(cls, **kw) -> "BertConfig":
        return cls(**kw)

    @classmethod
    def large_uncased(cls, **kw) -> "BertConfig":
        return cls(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            **kw,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256, **kw) -> "BertConfig":
        """Small config for tests/benchmark fixtures."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=32,
            num_hidden_layers=3,
            num_attention_heads=4,
            intermediate_size=64,
            **kw,
        )

    @classmethod
    def from_json(cls, path: str, **overrides) -> "BertConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in fields}
        kw.update(overrides)
        return cls(**kw)
