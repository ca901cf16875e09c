"""Checkpointing: npz-based param/optimizer snapshots.

Reference contract reproduced (`SDNetTrainer.py:453-509`):

* full save: network + optimizer + update count + loss meter + config + epoch
* ``save_for_predict``: params only, with the (frozen) BERT subtree and the
  pinned embedding tails dropped to keep inference checkpoints small
* load: key-intersection patching — extra stored keys are dropped, missing
  keys keep their initialized values — so partial checkpoints load.

Format: one ``.npz`` with '/'-joined tree paths (portable, no pickle), plus
a small json sidecar inside the archive for scalars/config.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)

_SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def save_checkpoint(
    path: str,
    params: Dict[str, Any],
    opt_leaves: Optional[list] = None,
    meta: Optional[Dict[str, Any]] = None,
):
    """Write params (+ optional flat optimizer leaves + json meta)."""
    arrays = {f"params{_SEP}{k}": v for k, v in flatten_tree(params).items()}
    if opt_leaves is not None:
        for i, leaf in enumerate(opt_leaves):
            arrays[f"opt{_SEP}{i:05d}"] = np.asarray(leaf)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
        log.info("model saved to %s", path)
    except BaseException:
        # reference behavior: saving failures are non-fatal
        # (`SDNetTrainer.py:484-490`)
        log.warning("[ WARN: Saving failed... continuing anyway. ]")


def save_for_predict(path: str, params: Dict[str, Any], meta=None):
    """Drop the BERT subtree (reloadable from the pretrained release) like
    `save_for_predict:492-509`."""
    tree = {k: v for k, v in params.items()}
    if "params" in tree:
        inner = {k: v for k, v in tree["params"].items() if k != "Bert"}
        tree = {**tree, "params": inner}
    save_checkpoint(path, tree, None, meta)


def load_checkpoint(
    path: str, init_params: Dict[str, Any]
) -> Tuple[Dict[str, Any], Optional[list], Dict[str, Any]]:
    """Key-intersection load: stored keys present in the init tree replace
    the init values; everything else keeps its initialization
    (`load_model:453-466`). Returns (params, opt_leaves_or_None, meta)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")
        stored = {
            k[len("params") + 1:]: z[k] for k in z.files if k.startswith("params" + _SEP)
        }
        opt_keys = sorted(k for k in z.files if k.startswith("opt" + _SEP))
        opt_leaves = [z[k] for k in opt_keys] if opt_keys else None

    init_flat = flatten_tree(init_params)
    merged = dict(init_flat)
    loaded = dropped = 0
    for k, v in stored.items():
        if k in init_flat:
            if init_flat[k].shape == v.shape:
                merged[k] = v
                loaded += 1
            else:
                log.warning("shape mismatch for %s: %s vs %s", k, init_flat[k].shape, v.shape)
                dropped += 1
        else:
            dropped += 1
    log.info("checkpoint %s: loaded %d tensors, dropped %d", path, loaded, dropped)
    params = unflatten_tree(merged)
    return params, opt_leaves, meta


def opt_state_leaves(opt_state) -> list:
    return jax.tree_util.tree_leaves(opt_state)


def restore_opt_state(template_opt_state, leaves: Optional[list], strict: bool = True):
    """Rebuild optimizer state from stored leaves.

    ``leaves is None`` (a ``save_for_predict`` checkpoint: params only, no
    optimizer state was ever stored) returns the fresh template — that is a
    legitimate inference checkpoint, not corruption. A *structural* mismatch
    between stored leaves and the template (leaf count / shape) means the
    checkpoint was produced by a different optimizer configuration; the
    reference loads the stored state faithfully or crashes
    (`SDNetTrainer.py:456-464`), so the default here is to raise. Pass
    ``strict=False`` (the ``LENIENT_OPT_RESUME`` conf flag) to instead warn
    and reinitialize — resume proceeds but Adamax momentum restarts."""
    if leaves is None:
        return template_opt_state
    template_leaves, treedef = jax.tree_util.tree_flatten(template_opt_state)

    def mismatch(why: str):
        if strict:
            raise ValueError(
                f"optimizer state in checkpoint does not match the current "
                f"optimizer ({why}); refusing to silently restart momentum. "
                f"Set LENIENT_OPT_RESUME to reinitialize instead."
            )
        log.warning("optimizer state mismatch (%s); reinitializing", why)
        return template_opt_state

    if len(template_leaves) != len(leaves):
        return mismatch(
            f"{len(leaves)} stored leaves vs {len(template_leaves)} expected"
        )
    try:
        cast = [
            np.asarray(l).astype(np.asarray(t).dtype).reshape(np.shape(t))
            for l, t in zip(leaves, template_leaves)
        ]
    except Exception as e:
        return mismatch(f"leaf shape/dtype: {e}")
    return jax.tree_util.tree_unflatten(treedef, cast)
