"""Pallas fused attention vs the XLA reference path (interpret mode on CPU;
the same kernel compiles for TPU via attention_impl='pallas')."""

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.models.bert.model import xla_attention
from ruart_tpu.ops.attention import flash_attention


def _rand_qkv(key, B, H, L, D):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, L, D))
    k = jax.random.normal(ks[1], (B, H, L, D))
    v = jax.random.normal(ks[2], (B, H, L, D))
    mask = (jax.random.uniform(ks[3], (B, L)) > 0.2).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # at least one valid position
    bias = (1.0 - mask[:, None, None, :]) * -10000.0
    return q, k, v, bias


def test_matches_xla_attention():
    q, k, v, bias = _rand_qkv(jax.random.PRNGKey(0), B=3, H=2, L=16, D=8)
    ref = xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_odd_length_and_all_masked_tail():
    q, k, v, bias = _rand_qkv(jax.random.PRNGKey(1), B=2, H=4, L=50, D=64)
    ref = xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grouped_attention_matches_xla():
    from ruart_tpu.ops.attention import grouped_attention

    key = jax.random.PRNGKey(2)
    B, L, H, dh = 37, 30, 12, 64  # B deliberately not a multiple of the group
    D = H * dh
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    bias_rows = (1.0 - mask) * -10000.0

    def split(x):
        return x.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

    ref = xla_attention(split(q), split(k), split(v), bias_rows[:, None, None, :])
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, L, D))
    out = grouped_attention(q, k, v, bias_rows, heads=H, group=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_packed_kernel_matches_unpacked_and_xla():
    """128-lane head-bundled kernel (2x-FLOP masked dots) vs full-width
    kernel vs XLA, including a dh=128 config where pack degenerates to 1."""
    from ruart_tpu.ops.attention import grouped_attention

    for B, L, H, dh, seed in ((21, 30, 12, 64, 3), (9, 16, 4, 128, 4)):
        D = H * dh
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        q = jax.random.normal(ks[0], (B, L, D))
        k = jax.random.normal(ks[1], (B, L, D))
        v = jax.random.normal(ks[2], (B, L, D))
        mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(jnp.float32)
        mask = mask.at[:, 0].set(1.0)
        bias_rows = (1.0 - mask) * -10000.0

        def split(x):
            return x.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

        ref = xla_attention(
            split(q), split(k), split(v), bias_rows[:, None, None, :]
        )
        ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, L, D))
        packed = grouped_attention(
            q, k, v, bias_rows, heads=H, group=8, interpret=True, packed=True
        )
        np.testing.assert_allclose(np.asarray(packed), ref, atol=3e-5)


def test_fused_attention_custom_vjp_matches_xla_grads():
    """fused_attention (the model's default TPU path) must be differentiable:
    forward = the Pallas kernel, backward = recompute through the XLA
    formulation. Gradients must match differentiating the XLA path."""
    from ruart_tpu.ops.attention import attention_rows_xla, fused_attention

    B, L, H, dh = 6, 14, 4, 64
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    bias_rows = (1.0 - mask) * -10000.0

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_attention(q, k, v, bias_rows, H, 4, True) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(attention_rows_xla(q, k, v, bias_rows, H) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-4)


def test_attention_auto_resolves_to_xla_off_tpu():
    """attention_impl='auto' (the default) must take the einsum path when
    the backend is not TPU — the Pallas kernel only compiles via Mosaic."""
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.bert.model import BertModel

    assert jax.default_backend() != "tpu"  # suite runs on the CPU platform
    cfg = BertConfig.tiny(vocab_size=64)
    assert cfg.attention_impl == "auto"
    model = BertModel(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
    layers, pooled = model.apply(params, ids, jnp.ones_like(ids))
    assert np.isfinite(np.asarray(pooled)).all()


def test_tp_kernel_ok_gate():
    from ruart_tpu.ops.attention import tp_kernel_ok

    # BERT-base: 12 heads, dh=64 (pack=2): tp=2 leaves 6 local heads -> ok;
    # tp=4 leaves 3 (odd) -> packed bundle can't fill, gate closes
    assert tp_kernel_ok(12, 64, 1)
    assert tp_kernel_ok(12, 64, 2)
    assert not tp_kernel_ok(12, 64, 4)
    assert not tp_kernel_ok(12, 64, 5)  # heads don't divide
    # BERT-large: 16 heads dh=64 -> tp 2/4/8 all pack
    assert tp_kernel_ok(16, 64, 4) and tp_kernel_ok(16, 64, 8)
    # tiny test config: 4 heads dh=8 (pack=16): any tp>1 under-fills
    assert tp_kernel_ok(4, 8, 1) and not tp_kernel_ok(4, 8, 2)


def test_sharded_fused_attention_matches_xla():
    """shard_map'd kernel on a (dp=4, tp=2) virtual mesh == the einsum
    reference: batch split over dp, head bundles over tp, no collectives."""
    from ruart_tpu.ops.attention import (
        attention_rows_xla,
        sharded_fused_attention,
        tp_kernel_ok,
    )
    from ruart_tpu.parallel.mesh import make_mesh

    B, L, H, dh = 8, 18, 4, 64  # tp=2 -> 2 local heads, pack=2: packs
    assert tp_kernel_ok(H, dh, 2)
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    bias_rows = (1.0 - mask) * -10000.0

    ref = np.asarray(attention_rows_xla(q, k, v, bias_rows, H))
    for tp in (1, 2):
        mesh = make_mesh(tp=tp)
        out = sharded_fused_attention(
            q, k, v, bias_rows, H, mesh, group=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_sharded_fused_attention_under_jit_with_sharded_inputs():
    """The kernel path composes with jit on inputs that already carry the
    (dp, tp) shardings the trainer produces."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ruart_tpu.ops.attention import (
        attention_rows_xla,
        sharded_fused_attention,
    )
    from ruart_tpu.parallel.mesh import make_mesh

    B, L, H, dh = 8, 10, 4, 64
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    bias_rows = jnp.zeros((B, L))
    ref = np.asarray(attention_rows_xla(q, k, v, bias_rows, H))

    mesh = make_mesh(tp=2)
    act = NamedSharding(mesh, P("dp", None, "tp"))
    qs, ks_, vs = (jax.device_put(x, act) for x in (q, k, v))
    bs = jax.device_put(bias_rows, NamedSharding(mesh, P("dp", None)))

    fn = jax.jit(
        lambda a, b, c, d: sharded_fused_attention(
            a, b, c, d, H, mesh, group=4, interpret=True
        )
    )
    np.testing.assert_allclose(np.asarray(fn(qs, ks_, vs, bs)), ref, atol=3e-5)


def test_sharded_fused_attention_bias2d_matches_xla():
    """The sequence-packing segment bias [B, L, L] through the shard_map'd
    kernel on (dp, tp) meshes == the einsum reference — the packed-table x
    tensor-parallel composition (dp shards the bias on dim 0; each tp
    shard applies the full per-query bias to its local head bundle)."""
    from ruart_tpu.ops.attention import (
        attention_rows_xla,
        sharded_fused_attention,
        tp_kernel_ok,
    )
    from ruart_tpu.parallel.mesh import make_mesh

    B, L, H, dh = 8, 16, 4, 64
    assert tp_kernel_ok(H, dh, 2)
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    q = jax.random.normal(ks[0], (B, L, D))
    k = jax.random.normal(ks[1], (B, L, D))
    v = jax.random.normal(ks[2], (B, L, D))
    seg = jax.random.randint(ks[3], (B, L), 0, 3)  # 0 = pad
    same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
    bias2d = (1.0 - same.astype(jnp.float32)) * -10000.0

    ref = np.asarray(attention_rows_xla(q, k, v, bias2d, H))
    for tp in (1, 2):
        mesh = make_mesh(tp=tp)
        out = sharded_fused_attention(
            q, k, v, bias2d, H, mesh, group=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)
