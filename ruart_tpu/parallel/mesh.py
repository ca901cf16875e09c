"""Device mesh + sharding layout.

The reference's only multi-device feature is a 2-GPU model split
(BERT on one device, fusion on the other — `SDNetTrainer.py:296-301`).
The TPU-native design replaces that with a 2-axis ``Mesh``:

* ``dp`` — data parallel over the batch axis (ICI within a slice, DCN
  across hosts). Every batch tensor is sharded on dim 0; XLA inserts the
  gradient ``psum`` automatically from the sharding constraints.
* ``tp`` — tensor parallel over the BERT encoder's head/FFN dimensions
  (the FLOP-dominant stage): QKV/output projections are sharded on the
  feature axis, the FFN on its hidden axis, so attention heads and FFN
  blocks compute locally and XLA reduces the partials over ICI.

The fusion stack's parameters are small (~10M) and stay replicated; its
activations inherit the batch sharding. Pipeline/expert parallelism do not
apply to this model family (no layer stack deep enough to pipeline at this
size, no MoE); the mesh API accepts extra axes so larger model families can
extend the same layout.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    devices: Optional[Sequence] = None,
    tp: int = 1,
    dp: Optional[int] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def auto_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Default mesh layout.

    For this model family the default is **pure data parallelism**: the
    FLOP-heavy stage (BERT-base, ~110M params) fits comfortably in one
    chip's HBM, the fusion stack is replicated anyway, and dp avoids the
    per-layer reduce collectives tensor parallelism inserts. Pass ``tp``
    (the ``tensor_parallel`` conf key) to opt into a (dp, tp) mesh — useful
    when a larger encoder (BERT_LARGE and up) needs its weights spread, or
    to shrink per-chip activation memory at huge batch. The Pallas
    attention kernel stays active under tp via
    ``ops.attention.sharded_fused_attention`` (head-aligned shard_map)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    tp = int(tp or 1)
    if n % tp != 0:
        raise ValueError(f"tensor_parallel={tp} does not divide {n} devices")
    return make_mesh(devices, tp=tp)


# ---------------------------------------------------------------------------
# Parameter layout
# ---------------------------------------------------------------------------

# (regex over 'a/b/c' param path, PartitionSpec) — first match wins.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # BERT attention projections: shard the head (output-feature) axis
    (r"Bert/.*attention_self/(query|key|value)/kernel$", P(None, TP_AXIS)),
    (r"Bert/.*attention_self/(query|key|value)/bias$", P(TP_AXIS)),
    # attention output: input axis is the sharded head axis -> local matmul
    # + psum (inserted by GSPMD)
    (r"Bert/.*attention_output_dense/kernel$", P(TP_AXIS, None)),
    # FFN: expand on hidden axis, contract back
    (r"Bert/.*intermediate_dense/kernel$", P(None, TP_AXIS)),
    (r"Bert/.*intermediate_dense/bias$", P(TP_AXIS)),
    (r"Bert/.*output_dense/kernel$", P(TP_AXIS, None)),
    # big embedding tables: shard the vocab axis over tp to spread HBM
    (r"Bert/embeddings/word_embeddings/embedding$", P(TP_AXIS, None)),
    (r"(glove|fast|phoc)_embed/embedding$", P(TP_AXIS, None)),
)


def param_pspec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def _tree_paths(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    else:
        yield prefix.rstrip("/"), tree


def _fits(spec: P, shape, mesh: Mesh) -> bool:
    """A PartitionSpec is usable only if every sharded dim divides evenly
    (e.g. an odd-sized vocabulary cannot shard over tp=2)."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if dim >= len(shape) or shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Matching tree of NamedShardings for a param tree; rules whose sharded
    dims don't divide the mesh axis fall back to replication."""

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}{k}/") for k, v in tree.items()}
        spec = param_pspec(prefix.rstrip("/"))
        if not _fits(spec, getattr(tree, "shape", ()), mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return build(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = param_shardings(params, mesh)
    if jax.process_count() > 1:
        # multi-host: device_put rejects shardings that span non-addressable
        # devices. Every host holds the identical full param tree (same-seed
        # deterministic init), so each contributes its addressable shards by
        # slicing its local copy.
        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx: x[idx]
            )

        return jax.tree.map(put, params, shardings)
    return jax.tree.map(jax.device_put, params, shardings)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Batch layout
# ---------------------------------------------------------------------------

def batch_pspec(mesh: Mesh) -> NamedSharding:
    """All batch tensors shard dim 0 (the per-question axis) over dp."""
    return NamedSharding(mesh, P(DP_AXIS))


def shard_batch(batch_tree: Any, mesh: Mesh) -> Any:
    sharding = batch_pspec(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch_tree)
