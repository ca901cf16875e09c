"""Multi-device tests on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.parallel.mesh import (
    DP_AXIS,
    TP_AXIS,
    auto_mesh,
    make_mesh,
    param_pspec,
    shard_batch,
    shard_params,
)


def test_device_count():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {DP_AXIS: 4, TP_AXIS: 2}
    mesh2 = make_mesh(tp=1)
    assert mesh2.shape == {DP_AXIS: 8, TP_AXIS: 1}
    # dp-only default (BERT-base fits one chip; dp avoids per-layer
    # collectives) — tp is an explicit opt-in
    auto = auto_mesh()
    assert auto.shape[TP_AXIS] == 1 and auto.shape[DP_AXIS] == 8
    auto_tp = auto_mesh(tp=2)
    assert auto_tp.shape == {DP_AXIS: 4, TP_AXIS: 2}
    with pytest.raises(ValueError):
        auto_mesh(tp=3)


def test_param_rules():
    from jax.sharding import PartitionSpec as P

    assert param_pspec("Bert/layer_0/attention_self/query/kernel") == P(None, "tp")
    assert param_pspec("Bert/layer_3/intermediate_dense/kernel") == P(None, "tp")
    assert param_pspec("Bert/layer_3/output_dense/kernel") == P("tp", None)
    assert param_pspec("glove_embed/embedding") == P("tp", None)
    assert param_pspec("get_answer/attn/linear/kernel") == P()


def test_sharded_matmul_matches_single_device():
    mesh = make_mesh(tp=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (8, 16))
    w = jax.random.normal(k2, (16, 32))
    expected = x @ w

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P(DP_AXIS, None)))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, TP_AXIS)))
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_two_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
