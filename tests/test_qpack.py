"""Question-row packing (`q_pack 1`, default on).

The [B, Lqb] question grid is mostly pad (real questions average ~12
wordpieces against the 50-piece conf cap) and the q encoder call measured
~26 ms of the 115 ms flagship batch (round-4 DCE profile). The q block now
rides the SAME dedup+pack machinery the candidate blocks use — max_num=1,
frac=1.0 so the table always attaches — with ``bert_inverse`` collapsed to
[B]. Packing is exact for the same reason candidate packing is (segment
bias == pad bias, per-segment position restart); these tests pin the
collator artifacts, full-model forward equality vs the dense q path, the
gradient path, and the fused-encoder interaction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import DEDUP_KEYS, Collator
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def _env(shipped_conf_opt, B=4, seed=0, **overrides):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(overrides)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, B, seed=seed)
    return opt, cfg, spec, q, ocr, od


def _attach_q_pack(opt, q, **coll_overrides):
    coll = Collator(Config({**opt, "bert_pack": 1, **coll_overrides}))
    B, Lqb = q["bert"].shape
    qp = dict(q)
    coll._add_dedup(qp, B, 1, Lqb, frac=1.0)
    assert "bert_packed" in qp, "q pack did not attach"
    qp["bert_inverse"] = qp["bert_inverse"].reshape(B)
    return qp


def test_collator_attaches_q_pack(shipped_conf_opt):
    """q packing is on by default, attaches via the dedup machinery with
    bert_inverse collapsed to [B], and the packed grid round-trips every
    question's tokens."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))

    coll = Collator(cfg)
    assert coll.q_pack
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 4, seed=1)
    qp = _attach_q_pack(opt, q)
    B, Lqb = q["bert"].shape
    assert qp["bert_inverse"].shape == (B,)
    packed = qp["bert_packed"]
    unpack = qp["bert_unpack"]
    flat = packed.reshape(-1)
    for b in range(B):
        orig = q["bert"][b]
        l = int((orig != 0).sum())
        idx = unpack[qp["bert_inverse"][b]]
        np.testing.assert_array_equal(flat[idx[:l]], orig[:l])


def test_q_pack_matches_dense_full_model(shipped_conf_opt):
    """Full-model forward with the packed q table equals the dense q path
    (both with and without the fused encoder call)."""
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt, B=4, seed=2)
    qp = _attach_q_pack(opt, q)
    model = RUArtModel(spec)
    jq, jqp, jocr, jod = (
        jax.tree.map(jnp.asarray, t) for t in (q, qp, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    dense = np.asarray(model.apply(params, jq, jocr, jod))
    packed = np.asarray(model.apply(params, jqp, jocr, jod))
    np.testing.assert_allclose(packed, dense, atol=2e-5)

    spec_nf = ModelSpec.from_config(
        Config({**opt, "bert_fuse": 0}), BertConfig.tiny(vocab_size=64)
    )
    model_nf = RUArtModel(spec_nf)
    packed_nf = np.asarray(model_nf.apply(params, jqp, jocr, jod))
    np.testing.assert_allclose(packed_nf, dense, atol=2e-5)


def test_q_pack_gradients_finite_and_match(shipped_conf_opt):
    """Gradients through the packed q path equal the dense q gradients."""
    import jax.flatten_util

    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt, B=4, seed=3)
    qp = _attach_q_pack(opt, q)
    model = RUArtModel(spec)
    jq, jqp, jocr, jod = (
        jax.tree.map(jnp.asarray, t) for t in (q, qp, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(1), jq, jocr, jod)

    def loss(qq):
        def f(p):
            s = model.apply(p, qq, jocr, jod, deterministic=True)
            return jnp.sum(jax.nn.log_softmax(s) ** 2)
        return f

    g_dense = jax.flatten_util.ravel_pytree(jax.grad(loss(jq))(params))[0]
    g_pack = jax.flatten_util.ravel_pytree(jax.grad(loss(jqp))(params))[0]
    g_pack = np.asarray(g_pack)
    assert np.isfinite(g_pack).all()
    np.testing.assert_allclose(g_pack, np.asarray(g_dense), atol=5e-5)


def test_q_pack_on_mesh_matches_single_device(shipped_conf_opt):
    """The dp-sharded q packed-table path equals the single-device packed
    forward (tables shard dim 0; GSPMD gathers across shards)."""
    from ruart_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    opt, cfg, spec, q, ocr, od = _env(
        shipped_conf_opt, B=8, seed=4, batch_size=8
    )
    qp = _attach_q_pack(opt, q)
    model = RUArtModel(spec)
    jq, jqp, jocr, jod = (
        jax.tree.map(jnp.asarray, t) for t in (q, qp, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(2), jq, jocr, jod)
    single = np.asarray(model.apply(params, jqp, jocr, jod))

    mesh = make_mesh()
    sp = shard_params(params, mesh)
    sq, socr, sod = (shard_batch(t, mesh) for t in (jqp, jocr, jod))
    meshed = np.asarray(jax.jit(model.apply)(sp, sq, socr, sod))
    np.testing.assert_allclose(meshed, single, atol=2e-5)


def test_serve_q_top_tables_signature(shipped_conf_opt):
    """_q_top_tables emits the worst-case q_pack signature: top ladder
    sizes, shape-compatible with the model (compiles and runs)."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 4, seed=5)
    coll = Collator(cfg)

    class Engine:
        collator = coll

    from ruart_tpu.serve import InferenceEngine

    qt = InferenceEngine._q_top_tables(Engine(), q)
    assert qt is not None
    B, Lqb = q["bert"].shape
    size = coll.dedup_cap(B, 1, 1.0)
    assert qt["bert_unpack"].shape[0] == size
    assert qt["bert_inverse"].shape == (B,)
    model = RUArtModel(spec)
    jq, jqt, jocr, jod = (
        jax.tree.map(jnp.asarray, t) for t in (q, qt, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(3), jq, jocr, jod)
    out = np.asarray(model.apply(params, jqt, jocr, jod))
    assert np.isfinite(out).all()
