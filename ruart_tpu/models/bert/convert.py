"""Torch BERT checkpoint -> flax param tree conversion.

Consumes either a 2018-era ``pytorch_model.bin`` state dict (the reference
loads these via `modeling.py:445-533`; LayerNorm params may be named
gamma/beta) or a modern HF ``BertModel`` state dict. Linear kernels are
transposed ([out, in] -> [in, out]); embeddings copy straight through.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_bert_state_dict(
    state: Mapping[str, Any], num_layers: int
) -> Dict[str, Any]:
    """Map a torch BERT state dict onto the ruart_tpu BertModel param tree."""
    sd = dict(state)
    # normalize prefix: strip a leading 'bert.' if present on every key
    if all(k.startswith("bert.") for k in sd if "embeddings" in k or "encoder" in k):
        sd = {k[len("bert."):] if k.startswith("bert.") else k: v for k, v in sd.items()}

    def ln(prefix: str) -> Dict[str, np.ndarray]:
        # 2018 checkpoints use gamma/beta; modern ones weight/bias
        scale = sd.get(prefix + ".gamma", sd.get(prefix + ".weight"))
        bias = sd.get(prefix + ".beta", sd.get(prefix + ".bias"))
        return {"scale": _np(scale), "bias": _np(bias)}

    def dense(prefix: str) -> Dict[str, np.ndarray]:
        return {
            "kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"]),
        }

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {
                "embedding": _np(sd["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": _np(sd["embeddings.position_embeddings.weight"])
            },
            "token_type_embeddings": {
                "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
            },
            "LayerNorm": ln("embeddings.LayerNorm"),
        },
        "pooler_dense": dense("pooler.dense"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention_self": {
                "query": dense(p + "attention.self.query"),
                "key": dense(p + "attention.self.key"),
                "value": dense(p + "attention.self.value"),
            },
            "attention_output_dense": dense(p + "attention.output.dense"),
            "attention_output_LayerNorm": ln(p + "attention.output.LayerNorm"),
            "intermediate_dense": dense(p + "intermediate.dense"),
            "output_dense": dense(p + "output.dense"),
            "output_LayerNorm": ln(p + "output.LayerNorm"),
        }
    return params


def load_bert_params(model_dir: str):
    """Load a reference-style BERT directory (bert_config.json +
    pytorch_model.bin) into (BertConfig, flax params)."""
    import os

    import torch

    from ruart_tpu.models.bert.config import BertConfig

    config = BertConfig.from_json(os.path.join(model_dir, "bert_config.json"))
    state = torch.load(
        os.path.join(model_dir, "pytorch_model.bin"),
        map_location="cpu",
        weights_only=True,
    )
    params = convert_bert_state_dict(state, config.num_hidden_layers)
    return config, {"params": params}
