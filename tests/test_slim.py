"""H2D slimming (`h2d_slim 1`, default on).

When the dedup/packed encoder tables ride a block, the dense ``bert`` /
``bert_mask`` / ``bert_offsets`` grids are provably dead to the model (the
encoder consumes the tables, pool-before-expand pools on
``bert_unique_offsets``, and only key MEMBERSHIP is checked elsewhere) —
but they are ~half a flagship batch's H2D bytes. `collate.slim_block`
drops them at device_put time; these tests pin (a) exactly which keys drop
and when, (b) full-forward score equality slimmed vs full, and (c) that a
dense (no-table) block is left untouched.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator, slim_block
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


def _attach_tables(opt, q, ocr, od):
    """Attach dedup+pack(+q_pack) exactly as the default Collator does."""
    coll = Collator(Config({**opt, "bert_pack": 1}))
    for block in (ocr, od):
        B, N, Lb = block["bert"].shape
        coll._add_dedup(block, B, N, Lb, frac=1.0)
        assert "bert_packed" in block
    B, Lqb = q["bert"].shape
    coll._add_dedup(q, B, 1, Lqb, frac=1.0)
    q["bert_inverse"] = q["bert_inverse"].reshape(B)
    return q, ocr, od


def test_slim_block_drops_exactly_the_dead_keys(shipped_conf_opt):
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    for block in (q, ocr, od):
        slim = slim_block(block)
        assert set(block) - set(slim) == {"bert", "bert_mask",
                                          "bert_offsets"}
        # shallow copy: surviving arrays are the same objects
        for k in slim:
            assert slim[k] is block[k]


def test_slim_block_noop_without_tables(shipped_conf_opt):
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    assert slim_block(ocr) is ocr
    assert slim_block(q) is q


def test_forward_equality_slimmed_vs_full(shipped_conf_opt):
    """The jitted forward on the slimmed dicts is score-identical to the
    full dicts (the dropped keys were dead inputs)."""
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    model = RUArtModel(spec)
    to_dev = lambda t: {k: jnp.asarray(v) for k, v in t.items()}
    qf, ocrf, odf = to_dev(q), to_dev(ocr), to_dev(od)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), qf, ocrf, odf)
    fwd = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
    )
    full = fwd(params, qf, ocrf, odf)
    slim = fwd(
        params, to_dev(slim_block(q)), to_dev(slim_block(ocr)),
        to_dev(slim_block(od)),
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(slim))


def test_evaluator_slims_by_default(shipped_conf_opt, monkeypatch):
    """device_put_batch drops the dead keys (default) and keeps them under
    h2d_slim 0."""
    from ruart_tpu.data.pipeline import device_put_batch

    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    batch = (q, ocr, od, None, [{}])
    q2, ocr2, od2, _, _ = device_put_batch(batch)
    assert "bert" not in ocr2 and "bert_offsets" not in q2
    q3, ocr3, od3, _, _ = device_put_batch(batch, slim=False)
    assert "bert" in ocr3 and "bert_offsets" in q3


def test_collator_aliases_shared_id_grids(shipped_conf_opt):
    """End-to-end alias chain: items sharing one word-id list under
    glove/fasttext/phoc collate to the SAME output array, so put_block's
    identity probe ships the (largest) grid once."""
    from tests.test_buckets import _mini_items
    from ruart_tpu.data.pipeline import put_block

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    items = _mini_items(cfg, 2, n_cands=4)
    _, ocr, _, _, _ = Collator(cfg)(items)
    assert ocr["glove"] is ocr["fasttext"]
    dev = put_block(ocr, slim=False)
    assert dev["glove"] is dev["fasttext"]


def test_put_block_ships_equal_id_grids_once(shipped_conf_opt, monkeypatch):
    """glove/fasttext/phoc routinely carry the same word-id grid; put_block
    must reuse one device buffer for ALIASED grids (identity probe — the
    collator emits the shared grid as the same ndarray object). Equal
    content under a distinct object ships separately unless the
    RUART_VERIFY_ALIASES debug flag turns byte comparison on."""
    from ruart_tpu.data.pipeline import put_block

    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    ids = np.asarray(ocr["glove"])
    ocr["fasttext"] = ids.copy()          # equal content, distinct object
    ocr["phoc"] = ids                     # identical object
    dev = put_block(ocr, slim=False)
    assert dev["glove"] is dev["phoc"]
    # hot path: no byte compare, the copy ships on its own buffer
    assert dev["glove"] is not dev["fasttext"]
    np.testing.assert_array_equal(np.asarray(dev["fasttext"]), ids)
    # debug flag: byte-equal grids collapse
    monkeypatch.setenv("RUART_VERIFY_ALIASES", "1")
    devv = put_block(ocr, slim=False)
    assert devv["glove"] is devv["fasttext"] is devv["phoc"]
    monkeypatch.delenv("RUART_VERIFY_ALIASES")
    ocr["fasttext"] = ids + 1             # different content
    dev2 = put_block(ocr, slim=False)
    assert dev2["glove"] is not dev2["fasttext"]
    np.testing.assert_array_equal(np.asarray(dev2["fasttext"]), ids + 1)
