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
    debug_nans: bool = False,
):
    """``debug_nans`` (the ``DEBUG_NANS`` conf flag) instruments the step
    with in-graph NaN sentinels via ``jax.experimental.checkify`` at the
    same semantic sites as the reference's eager asserts: the float batch
    inputs (`SDNetTrainer.py:224-226`), the model scores — which any NaN
    born inside the attention stack propagates into (`Layers.py:169,290,430`)
    — and targets/loss (`SDNetTrainer.py:339-359`). Debug-only: the checks
    add host syncs and disable donation, keep the flag off in production.
    """

    def train_step(state: TrainState, q, ocr, od, targets):
        rng, step_rng = jax.random.split(state.rng)
        if debug_nans:
            from jax.experimental import checkify

            checkify.check(
                jnp.isfinite(targets).all(),
                "NaN/Inf in targets (SDNetTrainer.py:348-351 sentinel)",
            )
            for name, item in (("q", q), ("ocr", ocr), ("od", od)):
                for key, arr in item.items():
                    if jnp.issubdtype(arr.dtype, jnp.floating):
                        checkify.check(
                            jnp.isfinite(arr).all(),
                            f"NaN/Inf in batch input {name}.{key} "
                            "(SDNetTrainer.py:224-226 sentinel)",
                        )

        def compute_loss(params):
            scores = model.apply(
                params, q, ocr, od, deterministic=False,
                rngs={"dropout": step_rng},
            )
            if debug_nans:
                from jax.experimental import checkify

                checkify.check(
                    jnp.isfinite(scores).all(),
                    "NaN/Inf in scores (SDNetTrainer.py:339-347 / "
                    "Layers.py:169,290 sentinel)",
                )
            return loss_fn(scores, targets)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        if debug_nans:
            from jax.experimental import checkify

            checkify.check(
                jnp.isfinite(loss),
                "NaN/Inf loss (SDNetTrainer.py:352-359 sentinel)",
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = row_pinner(params)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        return new_state, loss

    if debug_nans:
        from jax.experimental import checkify

        checked = checkify.checkify(train_step, errors=checkify.user_checks)
        # donating under checkify is unsafe (the error value aliases into
        # the program); debug mode trades memory for diagnosability
        jitted = jax.jit(checked)

        def throwing_step(state, q, ocr, od, targets):
            err, out = jitted(state, q, ocr, od, targets)
            checkify.check_error(err)  # raises on host with the check message
            return out

        return throwing_step

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
