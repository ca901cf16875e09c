"""Optimizer setup and parameter-freezing policy.

Reproduces `SDNetTrainer.setup_model:305-317`:

* optimizer '#' (shipped) -> Adamax(lr from conf, default 2e-3)
* 'ADAM' -> Adamax(lr 1e-3, weight_decay 0.5); 'ADAM2' -> Adam; 'SGD' -> SGD
* global grad-norm clip (`SDNetTrainer.py:366`) over trainable params
* frozen subtrees get no optimizer state and zero updates:
  - the BERT encoder under LOCK_BERT (`SDNet.py:91-94`)
  - glove/fast embeddings entirely unless TUNE_PARTIAL (`SDNet.py:76-86`)
* TUNE_PARTIAL row pinning: rows >= tune_partial are restored to their
  initial values after every step (`SDNetTrainer.py:369-373`), and row 1
  (the reference's Embedding padding_idx) never moves.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ruart_tpu.models.fusion.spec import ModelSpec

FROZEN = "frozen"
TRAIN = "train"


def make_optimizer(
    opt_name: str,
    lr: Optional[float],
    grad_clip: float,
    params: Dict[str, Any],
    spec: ModelSpec,
    tune_partial: bool,
) -> optax.GradientTransformation:
    if opt_name == "ADAM":
        base = optax.chain(
            optax.add_decayed_weights(0.5), optax.adamax(1e-3)
        )
    elif opt_name == "#":
        base = optax.adamax(lr if lr is not None else 2e-3)
    elif opt_name == "ADAM2":
        base = optax.adam(lr if lr is not None else 1e-3)
    elif opt_name == "SGD":
        base = optax.sgd(lr)
    else:
        raise ValueError(f"optimizer is wrong: {opt_name!r}")

    train_chain = optax.chain(optax.clip_by_global_norm(grad_clip), base)

    frozen_roots = set()
    if spec.lock_bert:
        frozen_roots.add("Bert")
    if not tune_partial:
        frozen_roots.update({"glove_embed", "fast_embed", "phoc_embed"})

    def labels(p):
        return {
            "params": {
                k: jax.tree.map(
                    lambda _: FROZEN if k in frozen_roots else TRAIN, v
                )
                for k, v in p["params"].items()
            }
        }

    return optax.multi_transform(
        {TRAIN: train_chain, FROZEN: optax.set_to_zero()}, labels
    )


def make_row_pinner(
    params: Dict[str, Any], spec: ModelSpec, tune_partial_rows: Optional[int]
) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
    """Returns f(params)->params restoring the fixed embedding rows after an
    update. The fixed slices are captured from the initial params (the
    reference keeps them as buffers, `SDNet.py:78-81`). Row 1 (<UNK>) is the
    torch padding_idx and is pinned as well."""
    if tune_partial_rows is None:
        return lambda p: p
    tp = int(tune_partial_rows)
    fixed: Dict[str, Tuple[jax.Array, jax.Array]] = {}
    for name in ("glove_embed", "fast_embed"):
        if name in params["params"]:
            emb = params["params"][name]["embedding"]
            fixed[name] = (
                jnp.asarray(emb[tp:]),
                jnp.asarray(emb[1]),
            )

    def pin(p):
        tree = dict(p["params"])
        for name, (tail, row1) in fixed.items():
            emb = tree[name]["embedding"]
            emb = emb.at[tp:].set(tail)
            emb = emb.at[1].set(row1)
            tree = {**tree, name: {"embedding": emb}}
        return {**p, "params": tree}

    return pin
