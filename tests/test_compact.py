"""Candidate-row compaction (`cand_compact`, Collator._add_compact).

The per-candidate pipeline (token embed + pre-align gather + multi2one +
BERT unpack/pooling) is row-independent, so the model may run it on the
gathered REAL candidate rows only and scatter last-states back — exact by
construction (pad rows are zeroed by the candidate mask in both paths).
These tests pin: the collator's attach/decline logic, model equality vs the
dense grid (with and without dedup/pack tables), the train step, and dp/tp
mesh equality vs single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import tiny_config
from ruart_tpu.data.collate import COMPACT_KEYS, Collator
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def _sparse_blocks(batch_size=4, seed=0, dedup=True, pack=False):
    """(cfg, spec, model, q, ocr, od) with candidate fill forced low enough
    that a compact bucket beats the dense grid at tiny shapes."""
    cfg = tiny_config(batch_size=batch_size)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    model = RUArtModel(spec)
    q, ocr, od, targets = make_synthetic_batch(spec, cfg, batch_size, seed=seed)
    coll = Collator(Config({
        **cfg.opt,
        "bert_dedup_frac": 1.0 if dedup else 0.0,
        "bert_pack": 1 if pack else 0,
        "bert_pack_len": 16,
    }))
    rng = np.random.RandomState(seed + 1)
    for block in (ocr, od):
        B, N, Lb = block["bert"].shape
        block["num"] = np.minimum(
            block["num"], rng.randint(1, max(2, N // 3), size=B)
        ).astype(np.int32)
        if dedup:
            coll._add_dedup(block, B, N, Lb)
        coll._add_compact(block, B, N)
        assert "cand_sel" in block, "test shapes too small for compaction"
    return cfg, spec, model, q, ocr, od, targets


def _strip(block):
    return {k: v for k, v in block.items() if k not in COMPACT_KEYS}


# ---------------------------------------------------------------------------
# collator
# ---------------------------------------------------------------------------

def test_add_compact_sel_contents():
    coll = Collator(tiny_config())
    out = {"num": np.array([2, 0, 3], dtype=np.int32)}
    coll._add_compact(out, 3, 8)
    sel = out["cand_sel"]
    # flat indices b*N+n of real rows, in row order, then the OOB sentinel
    assert sel.dtype == np.int32
    assert list(sel[:5]) == [0, 1, 16, 17, 18]
    assert (sel[5:] == 24).all()
    # bucketed length: smallest ladder step >= 5, strictly below 24
    assert 5 <= len(sel) < 24


def test_add_compact_declines_when_dense_wins():
    coll = Collator(tiny_config())
    # near-full grid: no ladder bucket below 24 holds 23 rows
    out = {"num": np.array([8, 8, 7], dtype=np.int32)}
    coll._add_compact(out, 3, 8)
    assert "cand_sel" not in out
    # empty batch: nothing to compact
    out = {"num": np.zeros(3, dtype=np.int32)}
    coll._add_compact(out, 3, 8)
    assert "cand_sel" not in out


def test_compact_conf_gates():
    cfg = tiny_config(cand_compact=0)
    coll = Collator(cfg)
    assert coll.compact_sizes(4, 12) == ()
    out = {"num": np.array([1, 1, 1, 1], dtype=np.int32)}
    coll._add_compact(out, 4, 12)
    assert "cand_sel" not in out
    # ratio ladder: ascending, 8-aligned, strictly below the dense count
    coll_on = Collator(tiny_config())
    sizes = coll_on.compact_sizes(256, 100)
    assert sizes == tuple(sorted(sizes))
    assert all(s % 8 == 0 and s < 25600 for s in sizes)
    # a 50-60% fill (the common region) must land in a sub-dense bucket
    assert any(0.5 * 25600 <= s < 25600 for s in sizes)


def test_collate_attaches_cand_sel_end_to_end():
    """The real __call__ path attaches cand_sel on sparse batches."""
    from ruart_tpu.data.dataset import VQADataset
    from ruart_tpu.data.preprocess import Preprocessor
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

    cfg = tiny_config(
        batch_size=4,
        # widen the grid so the synthetic batch is sparse (real fill varies
        # per question; compaction only attaches when a bucket beats dense)
        max_ocr_num=32,
        preprocess_ocr_name="ocr_PMTD_ASTER,ES_ocr",
        preprocess_od_name="OD_bottom-up",
        datadir=".", FEATURE_FOLDER=".",
    )
    raw = make_synthetic_raw_dataset(4, seed=0, with_answers=False)
    pre = Preprocessor(cfg)
    data = pre._process_data(raw["data"])
    pre.train_vocab = pre._build_vocab(data)
    pre.train_char_vocab = pre._build_char_vocab(pre.train_vocab)
    pre._assign_ids(data)
    ds = VQADataset(
        data, cfg, mode="test", tokenizer=WordPieceTokenizer(build_demo_vocab())
    )
    coll = Collator(cfg)
    q, ocr, od, gt, extra = coll([ds[i] for i in range(4)])
    # synthetic raw data is sparse at tiny caps: OCR compaction must fire
    assert "cand_sel" in ocr
    R = int(ocr["num"].sum())
    sel = ocr["cand_sel"]
    B, N = ocr["bert"].shape[:2]
    assert (sel[:R] < B * N).all() and (sel[R:] == B * N).all()


# ---------------------------------------------------------------------------
# model equality
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dedup,pack", [(False, False), (True, False), (True, True)])
def test_compact_matches_dense(dedup, pack):
    """Compact scores == dense scores on the same batch, across the three
    BERT table modes (dense rows / dedup'd uniques / packed uniques)."""
    cfg, spec, model, q, ocr, od, _ = _sparse_blocks(dedup=dedup, pack=pack)
    jq, jocr, jod = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    compact = np.asarray(model.apply(params, jq, jocr, jod, deterministic=True))
    dense = np.asarray(
        model.apply(params, jq, _strip(jocr), _strip(jod), deterministic=True)
    )
    np.testing.assert_allclose(compact, dense, atol=1e-5)


def test_compact_train_step():
    """Training through the compact gather/scatter: finite loss, params
    move, and the loss on a compacted batch matches the dense batch when
    dropout is disabled (identical graphs up to the gather/scatter)."""
    from ruart_tpu.train.loss import make_loss_fn
    from ruart_tpu.train.optim import make_optimizer, make_row_pinner
    from ruart_tpu.train.train_step import init_train_state, make_train_step

    cfg, spec, model, q, ocr, od, targets = _sparse_blocks()
    import dataclasses

    spec = dataclasses.replace(spec, dropout_p=0.0, dropout_emb=0.0)
    model = RUArtModel(spec)
    jq, jocr, jod = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    tx = make_optimizer("#", 1e-3, 10.0, params, spec, tune_partial=True)
    loss_fn = make_loss_fn("BCE_D1")
    pinner = make_row_pinner(params, spec, tune_partial_rows=8)
    step = make_train_step(model, tx, loss_fn, pinner, donate=False)
    tgt = jnp.asarray(targets)

    state = init_train_state(params, tx, seed=0)
    new_state, loss_c = step(state, jq, jocr, jod, tgt)
    state_d = init_train_state(params, tx, seed=0)
    _, loss_d = step(state_d, jq, _strip(jocr), _strip(jod), tgt)
    assert np.isfinite(float(loss_c))
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-5)
    # the compacted stage's own weight must receive gradient through the
    # gather/scatter (and stay NaN-free — the pad sentinel must not leak)
    leaf = lambda p: p["params"]["multi2one"]["rnn_0"]["fwd"]["w_ih"]
    delta = np.asarray(leaf(new_state.params)) - np.asarray(leaf(params))
    assert np.isfinite(delta).all()
    assert np.abs(delta).max() > 0


# ---------------------------------------------------------------------------
# mesh
# ---------------------------------------------------------------------------

def test_compact_on_dp_mesh_matches_single_device():
    """cand_sel is a batch-global index into the dp-sharded row axis; GSPMD
    must produce the single-device result (gathers/scatters cross shards)."""
    from ruart_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg, spec, model, q, ocr, od, _ = _sparse_blocks(pack=True)
    jq, jocr, jod = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    single = np.asarray(model.apply(params, jq, jocr, jod, deterministic=True))

    mesh = make_mesh(jax.devices()[:4], tp=2)
    with mesh:
        p = replicate(params, mesh)
        bq, bocr, bod = shard_batch((jq, jocr, jod), mesh)
        fn = jax.jit(
            lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
        )
        sharded = np.asarray(fn(p, bq, bocr, bod))
    np.testing.assert_allclose(single, sharded, atol=2e-5)
