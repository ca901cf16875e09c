"""BERT encoder (flax) — the FLOP-dominant stage of the pipeline.

A from-scratch implementation of the 2018 BERT architecture the reference
vendors (`Models/Bert/modeling.py:155-614`), restructured for TPU:

* the encoder returns ALL layer activations stacked as [num_layers, B, L, D]
  (the fusion model consumes an α-softmax combination of the 12 layers,
  `SDNet.py:573-583`);
* attention runs through the grouped Pallas kernel on TPU by default
  (``attention_impl='auto'``; measured 2.66x bf16 / 1.70x fp32 over the
  einsum path at flagship shapes) with XLA einsums as the off-TPU /
  forced-``'xla'`` path (the reference's vanilla O(L²) math,
  `modeling.py:233-246`);
* subword→word pooling is a batched segment-mean matmul
  (:func:`subword_to_word_pooling`) instead of the reference's Python double
  loop (`Models/Bert/Bert.py:111-123,149-165`);
* sequences longer than 512 are chunked and concatenated with positions
  restarting per chunk — the reference's deliberate quirk
  (`Bert.py:94-101`), reproduced at trace time with static shapes.

The reference runs BERT in eval mode even while training the fusion stack
(`Bert.py:43`), so every entry point here defaults to deterministic
(dropout-free) execution.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ruart_tpu.models.bert.config import BertConfig

ATTN_MASK_BIAS = -10000.0  # reference `modeling.py:583`


def _dtype(config: BertConfig):
    return jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32


def _dense(config: BertConfig, features: int, name: str):
    """Dense factory for the encoder's projection/FFN layers: plain
    ``nn.Dense`` normally, weight-only-int8 :class:`QuantDense` when
    ``config.quant == 'int8'`` (params converted offline by
    ``ops.quant.quantize_bert_params``)."""
    if config.quant == "int8":
        from ruart_tpu.ops.quant import QuantDense

        return QuantDense(features, name=name, dtype=_dtype(config))
    return nn.Dense(features, name=name, dtype=_dtype(config))


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(
        self, input_ids, token_type_ids=None, deterministic=True,
        position_ids=None,
    ):
        c = self.config
        seq_len = input_ids.shape[-1]
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(
            input_ids
        )
        # explicit position ids support sequence packing (positions restart
        # at each packed segment); default is the usual arange
        pos_ids = (
            position_ids
            if position_ids is not None
            else jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        )
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(
            token_type_ids
        )
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(_dtype(c))


def xla_attention(q, k, v, bias, dropout_fn=None):
    """Vanilla scaled-dot-product attention (`modeling.py:233-246`).

    q/k/v: [B, H, L, Dh]; bias: [B, 1, 1, L] additive mask.
    """
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_fn is not None:
        probs = dropout_fn(probs)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)


class DenseParams(nn.Module):
    """Dense-compatible parameter holder (kernel [in, out] + bias), used
    where several projections are fused into one GEMM while keeping the
    per-projection checkpoint layout."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic=True):
        c = self.config
        H, D = c.num_attention_heads, c.hidden_size
        dh = D // H
        dt = _dtype(c)

        # three separate Dense projections: XLA's dot-merger already fuses
        # parallel GEMMs sharing an operand (a hand-fused concat variant
        # measured ~3% SLOWER on v5e)
        def proj(name):
            return _dense(c, D, name)

        qp, kp, vp = proj("query")(hidden), proj("key")(hidden), proj("value")(hidden)

        # 'auto' (the default) takes the fused Pallas kernel on TPU — a
        # measured 2.66x (bf16) / 1.70x (fp32) over the einsum path at the
        # flagship shapes — and the XLA path elsewhere; 'pallas' forces it
        # regardless of backend. The kernel has no prob-dropout, so BOTH
        # pallas modes fall back to the einsum path for a non-deterministic
        # call with attention dropout configured (otherwise forcing
        # 'pallas' would silently drop the regularization). BERT runs
        # eval-mode-always like the reference (`Bert.py:49`), so this
        # fallback never triggers on the shipped path.
        dropout_ok = deterministic or c.attention_probs_dropout_prob == 0.0
        use_pallas = dropout_ok and (
            c.attention_impl == "pallas"
            or (c.attention_impl == "auto" and jax.default_backend() == "tpu")
        )
        if use_pallas:
            # grouped fused kernel in model layout: no head transposes, no
            # [B, H, L, L] HBM round trip; differentiable via a custom VJP
            # that recomputes through the XLA formulation (ops/attention.py)
            from ruart_tpu.ops.attention import (
                fused_attention,
                sharded_fused_attention,
            )

            # padding bias [B,1,1,L] passes key rows [B, L]; the packed
            # segment bias [B,1,L,L] passes the full [B, L, L] (tiny at
            # these L; the kernel adds it per query row)
            kernel_bias = bias[:, 0, 0, :] if bias.shape[2] == 1 else bias[:, 0]
            if c.mesh is not None and c.mesh.size > 1:
                # explicit shard_map partitioning (batch over dp, heads over
                # tp) — without it GSPMD replicates the Pallas custom call
                # on every device of the mesh
                ctx = sharded_fused_attention(
                    qp, kp, vp, kernel_bias, H, c.mesh
                )
            else:
                ctx = fused_attention(qp, kp, vp, kernel_bias, H)
            return ctx.astype(dt)

        # head-major einsum without explicit [B,H,L,D] transposes: XLA folds
        # the layout into the GEMMs instead of materializing relayouts
        B, L = hidden.shape[0], hidden.shape[1]
        q = qp.reshape(B, L, H, dh)
        k = kp.reshape(B, L, H, dh)
        v = vp.reshape(B, L, H, dh)
        scores = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(dh))
        scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        if not deterministic and c.attention_probs_dropout_prob > 0:
            probs = nn.Dropout(c.attention_probs_dropout_prob)(
                probs, deterministic=False
            )
        ctx = jnp.einsum(
            "bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32
        )
        return ctx.reshape(B, L, D).astype(dt)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic=True):
        c = self.config
        dt = _dtype(c)
        # In bf16 mode the whole layer stays bf16 (gelu/LayerNorm included):
        # fp32 round-trips on the [B·N, L, 4D] FFN tensor dominate HBM
        # traffic at these shapes. fp32 mode is bit-unchanged (dt == f32).
        attn_out = BertSelfAttention(c, name="attention_self")(
            hidden, bias, deterministic
        )
        attn_out = _dense(c, c.hidden_size, "attention_output_dense")(attn_out)
        attn_out = nn.Dropout(c.hidden_dropout_prob)(
            attn_out, deterministic=deterministic
        )
        hidden = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="attention_output_LayerNorm", dtype=dt
        )(attn_out + hidden)

        inter = _dense(c, c.intermediate_size, "intermediate_dense")(hidden)
        inter = jax.nn.gelu(inter, approximate=False)
        out = _dense(c, c.hidden_size, "output_dense")(inter)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="output_LayerNorm", dtype=dt
        )(out + hidden)
        return hidden


class BertModel(nn.Module):
    """Returns all encoder layers stacked [num_layers, B, L, D] plus the
    pooled [CLS] vector (reference `modeling.py:534-614` with
    output_all_encoded_layers=True)."""

    config: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
        combine_weights=None,
        stop_layer_gradients: bool = False,
        segment_ids=None,
        position_ids=None,
    ):
        """Without ``combine_weights``: returns (all_layers [L, B, Lb, D],
        pooled). With ``combine_weights`` [L]: returns (combined [B, Lb, D],
        pooled) — the weighted layer sum accumulated in-loop so the [L, ...]
        stack is never materialized (12x activation-memory saving vs the
        reference's pool-then-combine, same math). ``stop_layer_gradients``
        cuts gradients into the encoder while leaving the combine weights
        trainable (LOCK_BERT + BERT_LINEAR_COMBINE semantics).

        ``segment_ids`` [B, L] (0 = pad, >=1 = packed segment) switches the
        attention bias from the padding-row form [B,1,1,L] to a
        block-diagonal [B,1,L,L]: token q attends only keys of its own
        segment. Cross-segment and pad keys get the same ``ATTN_MASK_BIAS``
        a pad key gets in the dense layout, which underflows to an exact
        zero after the max-subtracted fp32 softmax — so a packed segment's
        outputs equal the same sequence encoded as its own row (sequence
        packing is exact, not approximate). Pass ``position_ids`` restarting
        at each segment to complete the equivalence."""
        c = self.config
        if segment_ids is not None:
            valid = segment_ids > 0
            same = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
                valid[:, None, :]
            )
            bias = (1.0 - same.astype(jnp.float32)) * ATTN_MASK_BIAS
            bias = bias[:, None]                      # [B, 1, L, L]
        else:
            if attention_mask is None:
                attention_mask = jnp.ones_like(input_ids)
            bias = (
                1.0 - attention_mask[:, None, None, :].astype(jnp.float32)
            ) * ATTN_MASK_BIAS
        hidden = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, deterministic, position_ids
        )
        layers = []
        acc = None
        for i in range(c.num_hidden_layers):
            hidden = BertLayer(c, name=f"layer_{i}")(hidden, bias, deterministic)
            out = hidden.astype(jnp.float32)
            if stop_layer_gradients:
                out = jax.lax.stop_gradient(out)
            if combine_weights is None:
                layers.append(out)
            else:
                term = combine_weights[i] * out
                acc = term if acc is None else acc + term
        last = layers[-1] if combine_weights is None else hidden.astype(jnp.float32)
        pooled = nn.Dense(c.hidden_size, name="pooler_dense")(last[:, 0])
        pooled = jnp.tanh(pooled)
        if combine_weights is None:
            return jnp.stack(layers, axis=0), pooled
        return acc, pooled


def encode_chunked(
    model: BertModel, params, input_ids, attention_mask, max_chunk: int = 512
):
    """Reference >512 chunking (`Bert.py:94-101`): encode fixed chunks
    sequentially (positions restart each chunk) and concatenate on the
    sequence axis. Static python loop — shapes stay fixed under jit."""
    L = input_ids.shape[-1]
    if L <= max_chunk:
        return model.apply(params, input_ids, attention_mask)[0]
    outs = []
    for p in range(0, L, max_chunk):
        sl = slice(p, min(p + max_chunk, L))
        outs.append(
            model.apply(params, input_ids[:, sl], attention_mask[:, sl])[0]
        )
    return jnp.concatenate(outs, axis=2)


def subword_to_word_pooling(
    bert_embedding: jax.Array,
    offsets: jax.Array,
    word_mask: jax.Array,
) -> jax.Array:
    """Mean-pool wordpiece spans into word vectors as one matmul.

    bert_embedding: [..., B, Lb, D] (leading layer axis allowed)
    offsets:        [B, W, 2] int32 (start, end) piece spans per word
    word_mask:      [B, W] 1 = real word

    Matches `Bert.py:111-123`: span length <= 1 (incl. empty) takes the
    vector at ``start``; longer spans take the mean over [start, end);
    masked words are zero.
    """
    Lb = bert_embedding.shape[-2]
    st = offsets[..., 0]                     # [B, W]
    ed = offsets[..., 1]
    span = ed - st
    k = jnp.arange(Lb, dtype=jnp.int32)[None, None, :]
    in_span = (k >= st[..., None]) & (k < ed[..., None])          # [B, W, Lb]
    single = span <= 1
    onehot = k == jnp.clip(st, 0, Lb - 1)[..., None]
    weights = jnp.where(
        single[..., None],
        onehot.astype(jnp.float32),
        in_span.astype(jnp.float32) / jnp.maximum(span, 1)[..., None],
    )
    weights = weights * word_mask[..., None].astype(jnp.float32)
    return jnp.einsum(
        "bwl,...bld->...bwd",
        weights,
        bert_embedding,
        preferred_element_type=jnp.float32,
    )


def linear_combine(all_layers: jax.Array, alpha: jax.Array, gamma: jax.Array):
    """α-softmax layer mix: sum_l softmax(α)_l * gamma * layer_l
    (`SDNet.py:573-583`). all_layers: [L, ...]; returns [...]."""
    w = jax.nn.softmax(alpha) * gamma.reshape(())
    return jnp.tensordot(w, all_layers, axes=(0, 0))


class BertWordEncoder(nn.Module):
    """BERT + word pooling + 12-layer linear combine in one module.

    Combining layers BEFORE pooling is mathematically identical to the
    reference's pool-then-combine (both are linear) and 12x cheaper on the
    pooling matmul.
    """

    config: BertConfig
    linear_combine: bool = True

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        offsets,
        word_mask,
        deterministic: bool = True,
    ):
        bert = BertModel(self.config, name="bert")
        if self.linear_combine:
            alpha = self.param(
                "alphaBERT", lambda k: jnp.ones((self.config.num_hidden_layers,))
            )
            gamma = self.param("gammaBERT", lambda k: jnp.ones((1, 1)))
            w = jax.nn.softmax(alpha) * gamma.reshape(())
            combined, _ = bert(
                input_ids, attention_mask, deterministic=deterministic,
                combine_weights=w,
            )
        else:
            all_layers, _ = bert(
                input_ids, attention_mask, deterministic=deterministic
            )
            combined = all_layers[-1]
        return subword_to_word_pooling(combined, offsets, word_mask)
