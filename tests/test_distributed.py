"""Multi-host readiness plumbing (parallel/distributed.py).

The actual multi-process run needs real multiple hosts; what is testable
single-process is the construction/slicing logic: the hybrid mesh
factorization (tp confined to ICI), per-process batch slicing (disjoint,
covering, ordered), the single-process degradations, and the global-array
assembly from process-local shards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.parallel.distributed import (
    hybrid_mesh_shape,
    make_global_batch,
    make_hybrid_mesh,
    maybe_initialize_distributed,
    process_batch_slice,
)
from ruart_tpu.parallel.mesh import DP_AXIS, TP_AXIS, batch_pspec, make_mesh


def test_hybrid_mesh_shape_factorization():
    # v5e-8 x 4 hosts, dp-only: 8 ici dp per host, 4 hosts over DCN
    assert hybrid_mesh_shape(32, 4, tp=1) == ((8, 1), (4, 1))
    # tp=4 inside each host
    assert hybrid_mesh_shape(32, 4, tp=4) == ((2, 4), (4, 1))
    # tp must stay within a host (ICI), never span DCN
    with pytest.raises(ValueError):
        hybrid_mesh_shape(32, 4, tp=16)
    with pytest.raises(ValueError):
        hybrid_mesh_shape(32, 4, tp=3)  # doesn't divide per-host count


def test_process_batch_slice_partitions():
    n, p = 256, 4
    slices = [process_batch_slice(n, r, p) for r in range(p)]
    seen = []
    for s in slices:
        seen.extend(range(n)[s])
    assert seen == list(range(n))  # disjoint, ordered, covering
    with pytest.raises(AssertionError):
        process_batch_slice(10, 0, 3)


def test_process_batch_slice_defaults_to_runtime():
    # single-process runtime: the slice is the whole batch
    assert process_batch_slice(8) == slice(0, 8)


def test_make_hybrid_mesh_single_process_matches_make_mesh():
    mesh = make_hybrid_mesh(tp=2)
    ref = make_mesh(tp=2)
    assert mesh.shape == ref.shape == {DP_AXIS: 4, TP_AXIS: 2}
    assert [d.id for d in mesh.devices.ravel()] == [
        d.id for d in ref.devices.ravel()
    ]


def test_make_global_batch_single_process():
    mesh = make_mesh(tp=1)
    local = {
        "a": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "b": np.arange(8, dtype=np.int32),
        "none": None,
    }
    out = make_global_batch(local, mesh, n_global=8)
    assert out["none"] is None
    np.testing.assert_array_equal(np.asarray(out["a"]), local["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]), local["b"])
    # sharded like the trainer's batch pspec
    assert out["a"].sharding.spec == batch_pspec(mesh).spec
    assert out["a"].sharding.mesh.shape[DP_AXIS] == 8


def test_maybe_initialize_is_noop_without_conf():
    assert maybe_initialize_distributed({}) is False
    assert maybe_initialize_distributed({"batch_size": 4}) is False
