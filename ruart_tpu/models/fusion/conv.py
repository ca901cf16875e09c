"""Character-CNN building blocks (`Models/Layers.py:41-122`).

Library-surface parity: the reference defines a char-CNN + max/average
pooling trio used by SDNet's character path (`SDNet.character_cnn:563-571`,
dormant in the shipped conf). TPU formulation: the window convolution is a
single dense contraction over an unfolded window axis (MXU-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ruart_tpu.models.fusion.layers import dropout_fn


class CharCNN(nn.Module):
    """tanh(Conv1d(window, out)) over [N, L, In] -> [N, L, Out]; odd window,
    same padding, no bias (`Layers.py:41-71`)."""

    window_size: int
    output_size: int
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(self, x, x_mask=None, deterministic: bool = True):
        assert self.window_size % 2 == 1, "window size must be an odd number"
        x = dropout_fn(self, x, self.dropout_p, False, deterministic)
        out = nn.Conv(
            self.output_size,
            kernel_size=(self.window_size,),
            padding="SAME",
            use_bias=False,
            name="cnn",
        )(x)
        return jnp.tanh(out)


def max_pooling(x: jax.Array, x_mask: jax.Array) -> jax.Array:
    """Masked max over the subitem axis; all-masked rows -> 0
    (`Layers.py:74-95`)."""
    MIN = -1e6
    masked = jnp.where(x_mask[..., None].astype(bool), x, MIN)
    out = jnp.max(masked, axis=-2)
    return jnp.where(out == MIN, 0.0, out)


def average_pooling(x: jax.Array, x_mask: jax.Array) -> jax.Array:
    """Masked mean over the subitem axis (`Layers.py:97-122`)."""
    m = x_mask[..., None].astype(x.dtype)
    s = jnp.sum(x * m, axis=-2)
    n = jnp.clip(jnp.sum(m, axis=-2), 1.0, None)
    return s / n
