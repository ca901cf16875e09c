"""History-of-word multi-level inter-attention (`Models/Layers.py:471-524`).

x1 (context/candidates) attends to x2 (question) at every abstraction level:
the attention keys are the concatenation of word-level and all-but-last
abstraction layers on both sides; each level's values are one x2 abstraction
layer; the concatenated [x1 abstractions ‖ attended levels] feeds a BiLSTM.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ruart_tpu.models.fusion.layers import Attention
from ruart_tpu.models.fusion.rnn import StackedBRNN


class DeepAttention(nn.Module):
    abstr_list_cnt: int
    deep_att_hidden_size_per_abstr: int
    highlvl_hidden_size: int
    correlation_func: int = 3
    no_deep_attention: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(
        self,
        x1_word: Sequence[jnp.ndarray],
        x1_abstr: Sequence[jnp.ndarray],
        x2_word: Sequence[jnp.ndarray],
        x2_abstr: Sequence[jnp.ndarray],
        x1_mask: jnp.ndarray,
        x2_mask: jnp.ndarray,
        deterministic: bool = True,
        return_bef_rnn: bool = False,
    ):
        if not self.no_deep_attention:
            x1_att = jnp.concatenate(list(x1_word) + list(x1_abstr), axis=2)
            x2_att = jnp.concatenate(list(x2_word) + list(x2_abstr[:-1]), axis=2)
            x1 = jnp.concatenate(list(x1_abstr), axis=2)
            for i, values in enumerate(x2_abstr):
                attended = Attention(
                    self.deep_att_hidden_size_per_abstr,
                    self.correlation_func,
                    dropout_p=self.dropout_p,
                    variational=self.variational,
                    name=f"int_attn_{i}",
                )(x1_att, x2_att, x2_mask, x3=values, deterministic=deterministic)
                x1 = jnp.concatenate([x1, attended], axis=2)
        else:
            x1 = jnp.concatenate(list(x1_abstr), axis=2)

        x1_hiddens = StackedBRNN(
            self.highlvl_hidden_size,
            num_layers=1,
            bidirectional=True,
            dropout_p=self.dropout_p,
            variational=self.variational,
            name="rnn",
        )(x1, deterministic=deterministic)
        if return_bef_rnn:
            return x1_hiddens, x1
        return x1_hiddens
