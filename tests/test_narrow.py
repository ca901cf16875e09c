"""H2D dtype narrowing (`h2d_narrow 1`, default on).

The collator ships integer grids at the narrowest safe dtype (int8 tag
ids, int16 word/wordpiece ids, offsets and gather indices) and the model
widens back to int32 on device — cutting flagship H2D bytes roughly in
half on top of slimming. These tests pin:

* exactness: narrowed blocks widen back to the int32 blocks bit-for-bit,
  and the jitted forward is score-identical on both;
* the static gates: word ids narrow only when `vocab_size` fits int16,
  index keys only when their table's shape bound fits;
* aliasing: the shared glove/fasttext/phoc grid stays ONE object through
  narrowing (put_block ships it once);
* serve warmup: hand-built variant signatures renarrow to live dtypes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator, narrow_block
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
    coll = Collator(Config({**opt, "bert_pack": 1}))
    for block in (ocr, od):
        B, N, Lb = block["bert"].shape
        coll._add_dedup(block, B, N, Lb, frac=1.0)
        coll._add_compact(block, B, N)
    B, Lqb = q["bert"].shape
    coll._add_dedup(q, B, 1, Lqb, frac=1.0)
    q["bert_inverse"] = q["bert_inverse"].reshape(B)
    return q, ocr, od


def _widen_np(block):
    return {
        k: (v.astype(np.int32) if v.dtype.kind in "iu" and v.dtype.itemsize < 4
            else v)
        for k, v in block.items()
    }


def test_narrow_block_exact_and_dtypes(shipped_conf_opt):
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    ref = {k: v.copy() for k, v in ocr.items()}
    narrow_block(ocr, word16=True, bert16=True)
    assert ocr["pos"].dtype == np.int8 and ocr["ent"].dtype == np.int8
    assert ocr["glove"].dtype == np.int16
    assert ocr["len"].dtype == np.int16 and ocr["num"].dtype == np.int16
    for k in ("bert", "bert_packed", "bert_packed_seg", "bert_packed_pos"):
        if k in ocr:
            assert ocr[k].dtype == np.int16, k
    # index keys narrowed (tiny shapes: all bounds fit)
    assert ocr["bert_inverse"].dtype == np.int16
    assert ocr["cand_sel"].dtype == np.int16
    wide = _widen_np(ocr)
    for k in ref:
        np.testing.assert_array_equal(wide[k], ref[k], err_msg=k)


def test_narrow_word_gate_and_index_gate(shipped_conf_opt):
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    narrow_block(ocr, word16=False, bert16=False)
    assert ocr["glove"].dtype == np.int32          # vocab too large: keep
    assert ocr["bert_packed"].dtype == np.int32
    assert ocr["pos"].dtype == np.int8             # tag tables always fit


def test_narrow_preserves_grid_aliasing(shipped_conf_opt):
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    ids = np.asarray(ocr["glove"])
    ocr["fasttext"] = ids                          # aliased, like collate
    ocr["phoc"] = ids
    narrow_block(ocr, word16=True, bert16=True)
    assert ocr["glove"] is ocr["fasttext"] is ocr["phoc"]
    assert ocr["glove"].dtype == np.int16


def test_collator_narrows_by_default_and_opts_out(shipped_conf_opt):
    """Through the REAL collator on real pipeline items: default output is
    narrowed, `h2d_narrow 0` restores int32, and the two widen to equality."""
    from ruart_tpu.data.dataset import VQADataset
    from ruart_tpu.data.preprocess import Preprocessor
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update({
        "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
        "preprocess_od_name": "OD_bottom-up",
        "Task": "train",
        "FEATURE_FOLDER": "/tmp/narrow_features",
    })
    cfg = Config(opt)
    raw = make_synthetic_raw_dataset(8, seed=0, with_answers=True)
    pre = Preprocessor(cfg)
    data = pre._process_data(raw["data"])
    pre.train_vocab = pre._build_vocab(data)
    pre._assign_ids(data)
    cfg.opt["vocab_size"] = len(pre.train_vocab)
    tok = WordPieceTokenizer(build_demo_vocab())
    ds = VQADataset(data, cfg, mode="train", tokenizer=tok)
    items = [ds[i] for i in range(4)]

    narrow = Collator(Config(dict(cfg.opt)))(items)
    wide = Collator(Config({**cfg.opt, "h2d_narrow": 0}))(items)
    assert narrow[1]["glove"].dtype == np.int16
    assert narrow[1]["pos"].dtype == np.int8
    assert wide[1]["glove"].dtype == np.int32
    for nb, wb, name in zip(narrow[:3], wide[:3], "q ocr od".split()):
        nb, wb = _widen_np(nb), wb
        assert set(nb) == set(wb), name
        for k in nb:
            np.testing.assert_array_equal(nb[k], wb[k], err_msg=f"{name}.{k}")


def test_forward_equality_narrow_vs_wide(shipped_conf_opt):
    """Jitted forward on narrowed dicts is bit-identical to int32 dicts
    (the device-side widen restores exact values before any arithmetic)."""
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    model = RUArtModel(spec)
    to_dev = lambda t: {k: jnp.asarray(v) for k, v in t.items()}
    qf, ocrf, odf = to_dev(q), to_dev(ocr), to_dev(od)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), qf, ocrf, odf)
    fwd = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
    )
    wide_out = fwd(params, qf, ocrf, odf)
    nq, nocr, nod = (
        narrow_block(dict(t), word16=True, bert16=True)
        for t in (q, ocr, od)
    )
    narrow_out = fwd(params, to_dev(nq), to_dev(nocr), to_dev(nod))
    np.testing.assert_array_equal(np.asarray(wide_out), np.asarray(narrow_out))


def test_serve_warmup_variants_match_live_dtypes(shipped_conf_opt):
    """Every warmup-compiled signature must be reachable by live traffic:
    variant dicts hand-built with int32 keys renarrow before compile, so a
    live (collator-narrowed) batch with the same shapes hits the cache."""
    opt, cfg, spec, q, ocr, od = _env(shipped_conf_opt)
    q, ocr, od = _attach_tables(opt, q, ocr, od)
    from ruart_tpu.serve import InferenceEngine

    engine = InferenceEngine.__new__(InferenceEngine)
    engine.collator = Collator(Config(dict(opt)))
    engine._h2d_slim = True
    block = dict(ocr)
    block["cand_sel"] = np.arange(5, dtype=np.int32)   # hand-built variant
    out = engine._renarrow(block)
    assert out["cand_sel"].dtype == np.int16
    assert out["pos"].dtype == np.int8
