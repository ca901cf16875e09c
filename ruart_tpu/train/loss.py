"""Training losses.

``BCE_D1`` (the shipped loss): elementwise binary cross entropy **with
logits** applied to the already-softmaxed score vector, mean over all
elements, scaled by the number of label slots — an exact reproduction of
`SDNetTrainer.instance_bce_with_logits:510-518` (including the quirk that
the "logits" are softmax outputs in [0,1]). ``CE`` uses the argmax target
(`SDNetTrainer.py:343-344`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCE-with-logits, mean-reduced
    (torch.nn.functional.binary_cross_entropy_with_logits semantics)."""
    neg_abs = -jnp.abs(logits)
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(neg_abs))
    )
    return jnp.mean(loss)


def instance_bce_with_logits(
    scores: jax.Array, labels: jax.Array, scale_d1: bool = True
) -> jax.Array:
    assert scores.ndim == 2
    loss = bce_with_logits(scores, labels)
    if scale_d1:
        loss = loss * labels.shape[1]
    return loss


def cross_entropy(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """CE over the soft-label argmax (reference converts one/multi-hot
    targets to class indices via nonzero, `SDNetTrainer.py:343-344`)."""
    targets = jnp.argmax(labels, axis=-1)
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))


def make_loss_fn(loss_name: str):
    if loss_name in ("BCE", "BCE_D1"):
        scale = loss_name == "BCE_D1"
        return lambda s, l: instance_bce_with_logits(s, l, scale_d1=scale)
    if loss_name == "CE":
        return cross_entropy
    raise ValueError(f"unknown loss {loss_name!r}")
