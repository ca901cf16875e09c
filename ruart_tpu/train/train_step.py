"""Jitted train / eval steps.

One fused device program per step: forward (BERT + fusion), loss, backward,
clipped Adamax update, embedding-row pinning — with donated state so XLA
updates parameters in place (no reference equivalent; the torch loop does
this in eager pieces, `SDNetTrainer.py:330-376`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ruart_tpu.models.fusion.model import RUArtModel


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array


def make_train_step(
    model: RUArtModel,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    row_pinner: Callable,
    donate: bool = True,
):
    def train_step(state: TrainState, q, ocr, od, targets):
        rng, step_rng = jax.random.split(state.rng)

        def compute_loss(params):
            scores = model.apply(
                params, q, ocr, od, deterministic=False,
                rngs={"dropout": step_rng},
            )
            return loss_fn(scores, targets)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = row_pinner(params)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        return new_state, loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: RUArtModel, loss_fn: Optional[Callable] = None):
    def eval_step(params, q, ocr, od, targets):
        scores = model.apply(params, q, ocr, od, deterministic=True)
        if loss_fn is not None and targets is not None:
            loss = loss_fn(scores, targets)
        else:
            loss = jnp.zeros(())
        return scores, loss

    return jax.jit(eval_step)


def init_train_state(
    params: Dict[str, Any], tx: optax.GradientTransformation, seed: int
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )
