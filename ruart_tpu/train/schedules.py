"""Warmup learning-rate schedules + BertAdam-style optimizer.

The reference vendors a BERT Adam variant with decoupled weight decay and
warmup schedules (`Models/Bert/optimization.py:32-161`); it is never wired
into the trainer (`SDNetTrainer.py:307-317` uses Adamax) but belongs to the
library surface. Expressed here as optax schedules/transforms.
"""

from __future__ import annotations

import optax


def warmup_constant(lr: float, warmup: float, total_steps: int):
    """lr * min(1, frac/warmup) (`optimization.py:37-40`)."""
    warmup_steps = max(int(warmup * total_steps), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.constant_schedule(lr),
        ],
        [warmup_steps],
    )


def warmup_linear(lr: float, warmup: float, total_steps: int):
    """Linear warmup then linear decay to 0 (`optimization.py:32-35`)."""
    warmup_steps = max(int(warmup * total_steps), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def warmup_cosine(lr: float, warmup: float, total_steps: int):
    warmup_steps = max(int(warmup * total_steps), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.cosine_decay_schedule(lr, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


SCHEDULES = {
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
    "warmup_cosine": warmup_cosine,
}


def bert_adam(
    lr: float = 5e-5,
    warmup: float = -1,
    total_steps: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Adam + decoupled weight decay + warmup + per-call grad clipping,
    matching `BertAdam` (`optimization.py:44-161`). Note BertAdam omits
    bias correction — reproduced via optax.scale_by_adam(...) with
    bias-correction disabled through b1/b2 power terms being skipped is not
    expressible directly; we use standard Adam moments, which differ only
    during the first ~1/(1-b2) steps."""
    if warmup >= 0 and total_steps > 0:
        sched = SCHEDULES[schedule](lr, warmup, total_steps)
    else:
        sched = optax.constant_schedule(lr)
    parts = []
    if max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_schedule(lambda step: -sched(step)))
    return optax.chain(*parts)
