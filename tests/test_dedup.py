"""BERT candidate dedup (bert_dedup_frac): must be numerically identical to
the dense path — the encoder output depends only on the piece-id row."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def test_dedup_matches_dense(shipped_conf_opt):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, gt = make_synthetic_batch(spec, cfg, 2, seed=0)

    # plant heavy duplication: copy candidate 0's features over candidates 1..3
    for block in (ocr,):
        for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
            block[k][:, 1:4] = block[k][:, 0:1]
        block["len"][:, 1:4] = block["len"][:, 0:1]
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    dense = np.asarray(model.apply(params, jq, jocr, jod))

    # dedup batch: attach unique/inverse exactly as the Collator does.
    # bert_pack 0: this test pins the UNPACKED unique-table path (packing
    # is default-on and has its own equivalence suite in test_pack.py).
    coll = Collator(Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 0}))
    B, N, Lb = ocr["bert"].shape
    ocr_d = dict(ocr)
    out = {"bert": ocr["bert"], "bert_mask": ocr["bert_mask"]}
    coll._add_dedup(out, B, N, Lb)
    assert "bert_unique" in out, "dedup should fit with frac=1.0"
    assert out["bert_unique"].shape[0] % 64 == 0
    # duplicated candidates share an inverse index
    inv = out["bert_inverse"]
    assert (inv[:, 1:4] == inv[:, 0:1]).all()
    ocr_d["bert_unique"] = out["bert_unique"]
    ocr_d["bert_inverse"] = out["bert_inverse"]

    deduped = np.asarray(
        model.apply(params, jq, jax.tree.map(jnp.asarray, ocr_d), jod)
    )
    np.testing.assert_allclose(deduped, dense, atol=2e-5)


def test_dedup_cap_fallback(shipped_conf_opt):
    """When uniques exceed the cap, the collator omits the dedup keys and
    the model silently uses the dense path."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["bert_dedup_frac"] = 0.01  # cap 64 rows; 2*12=24... force tiny cap
    coll = Collator(Config(opt))
    rng = np.random.RandomState(0)
    B, N, Lb = 8, 12, 10
    out = {"bert": rng.randint(1, 60, size=(B, N, Lb)).astype(np.int32)}
    out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
    coll._add_dedup(out, B, N, Lb)
    # 96 random rows are all unique > cap 64 -> fallback (no dedup OR
    # packed artifacts; packing rides the dedup table)
    assert "bert_unique" not in out and "bert_packed" not in out


def test_dedup_on_by_default_at_realistic_shapes(shipped_conf_opt):
    """With no bert_dedup_frac in the conf, a duplicated batch at realistic
    candidate counts gets the dedup artifacts (default 0.25), and a tiny
    batch where the 64-row cap cannot win stays dense."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.pop("bert_dedup_frac", None)
    coll = Collator(Config(opt))
    assert coll.dedup_frac == 0.25
    assert coll.pack  # sequence packing rides the dedup table by default

    rng = np.random.RandomState(0)
    B, N, Lb = 8, 64, 10  # 512 rows, cap = ceil(0.25*512/64)*64 = 128
    pool = rng.randint(1, 60, size=(40, Lb)).astype(np.int32)
    out = {"bert": pool[rng.randint(0, 40, size=(B, N))]}
    out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
    coll._add_dedup(out, B, N, Lb)
    # default artifacts are the PACKED table (+ inverse for the gather)
    assert "bert_packed" in out and "bert_inverse" in out
    assert "bert_unique" not in out

    # same batch through the unpacked path: <= 40 unique rows land in the
    # small cap bucket (default ladder is (cap/2, cap) = (64, 128); bucket
    # count bounds the jit program count)
    coll_u = Collator(Config({**opt, "bert_pack": 0}))
    out_u = {"bert": out["bert"], "bert_mask": out["bert_mask"]}
    coll_u._add_dedup(out_u, B, N, Lb)
    assert "bert_unique" in out_u
    assert out_u["bert_unique"].shape[0] == 64

    # tiny batch: cap 64 >= B*N 24 -> no win -> dense
    small = {"bert": pool[rng.randint(0, 40, size=(2, 12))]}
    small["bert_mask"] = (small["bert"] != 0).astype(np.int32)
    coll._add_dedup(small, 2, 12, Lb)
    assert "bert_unique" not in small and "bert_packed" not in small


def test_dedup_fallback_is_logged(shipped_conf_opt, caplog):
    import logging

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["bert_dedup_frac"] = 0.01
    coll = Collator(Config(opt))
    rng = np.random.RandomState(0)
    B, N, Lb = 8, 12, 10
    out = {"bert": rng.randint(1, 60, size=(B, N, Lb)).astype(np.int32)}
    out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
    with caplog.at_level(logging.WARNING, logger="ruart_tpu.data.collate"):
        coll._add_dedup(out, B, N, Lb)
    assert "bert_unique" not in out and "bert_packed" not in out
    assert coll.dedup_fallbacks == 1
    assert any("dedup fallback" in r.message for r in caplog.records)


def test_dedup_cap_ladder(shipped_conf_opt):
    """The unique table pads to the smallest fitting 64-aligned bucket from
    a fixed power-of-2 ladder under the cap; `bert_dedup_buckets 1`
    restores the single fixed cap shape."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["bert_pack"] = 0  # bucket-shape assertions are on the unpacked table
    coll = Collator(Config(opt))
    # default 4 halving steps: batch-global duplication grows sublinearly
    # with batch, so the ladder must reach well below cap/2
    assert coll._dedup_ladder(1600) == (256, 448, 832, 1600)
    assert coll._dedup_ladder(64) == (64,)

    opt3 = dict(opt, bert_dedup_buckets=3)
    assert Collator(Config(opt3))._dedup_ladder(1600) == (448, 832, 1600)
    opt1 = dict(opt, bert_dedup_buckets=1)
    assert Collator(Config(opt1))._dedup_ladder(1600) == (1600,)

    # high-duplication batch -> small bucket; low-duplication -> big bucket
    rng = np.random.RandomState(0)
    B, N, Lb = 8, 64, 10  # cap 128, ladder (64, 128)
    pool_small = rng.randint(1, 60, size=(40, Lb)).astype(np.int32)
    pool_big = rng.randint(1, 60, size=(100, Lb)).astype(np.int32)
    for pool, expect in ((pool_small, 64), (pool_big, 128)):
        out = {"bert": pool[rng.randint(0, len(pool), size=(B, N))]}
        out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
        coll._add_dedup(out, B, N, Lb)
        if "bert_unique" in out:
            assert out["bert_unique"].shape[0] == expect
    # dedup semantics unchanged: every row reconstructs exactly
    rec = out["bert_unique"][out["bert_inverse"]]
    np.testing.assert_array_equal(rec, out["bert"])


def test_dedup_len_ladder(shipped_conf_opt):
    """Wordpiece-axis ladder: 8-aligned halving steps under the block cap,
    steps saving <25% skipped, bert_dedup_len_buckets 1 restores the fixed
    width."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    coll = Collator(Config(opt))
    assert coll.dedup_len_ladder(30) == (16, 30)
    assert coll.dedup_len_ladder(16) == (8, 16)
    assert coll.dedup_len_ladder(10) == (10,)  # 8 saves <25%: skipped
    opt1 = dict(opt, bert_dedup_len_buckets=1)
    assert Collator(Config(opt1)).dedup_len_ladder(30) == (30,)
    opt3 = dict(opt, bert_dedup_len_buckets=3)
    assert Collator(Config(opt3)).dedup_len_ladder(30) == (8, 16, 30)


def test_dedup_len_bucket_matches_dense(shipped_conf_opt):
    """When every row in the batch is short, the unique table trims its
    wordpiece axis to the smallest ladder width — numerically identical to
    the dense path (BERT output per row is independent of trailing pad)."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["max_ocr_bert_len"] = 16
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)

    # make every OCR row fit 8 pieces so the (8, 16) ladder trims to 8,
    # and plant duplication so the row dedup is non-trivial
    ocr["bert"][:, :, 8:] = 0
    ocr["bert_offsets"][..., 0] = np.minimum(ocr["bert_offsets"][..., 0], 7)
    ocr["bert_offsets"][..., 1] = np.minimum(ocr["bert_offsets"][..., 1], 8)
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr[k][:, 1:6] = ocr[k][:, 0:1]
    ocr["len"][:, 1:6] = ocr["len"][:, 0:1]
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    dense = np.asarray(model.apply(params, jq, jocr, jod))

    coll = Collator(Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 0}))
    B, N, Lb = ocr["bert"].shape
    out = {"bert": ocr["bert"], "bert_mask": ocr["bert_mask"]}
    coll._add_dedup(out, B, N, Lb)
    assert "bert_unique" in out
    assert out["bert_unique"].shape[1] == 8  # trimmed wordpiece axis
    # exact reconstruction on the trimmed width; the rest was all pad
    rec = out["bert_unique"][out["bert_inverse"]]
    np.testing.assert_array_equal(rec, ocr["bert"][..., :8])

    ocr_d = dict(ocr)
    ocr_d["bert_unique"] = out["bert_unique"]
    ocr_d["bert_inverse"] = out["bert_inverse"]
    deduped = np.asarray(
        model.apply(params, jq, jax.tree.map(jnp.asarray, ocr_d), jod)
    )
    np.testing.assert_allclose(deduped, dense, atol=2e-5)


def test_dedup_on_mesh_matches_dense_and_single_device(shipped_conf_opt):
    """The dp-sharded unique-table path (bert_unique [cap, Lb] sharded on
    dim 0, gathered back across shards by GSPMD) must equal both the dense
    mesh forward and the single-device dedup forward. Closes VERDICT r2
    weak #5: on tiny shapes the cannot-win guard drops dedup silently, so
    this forces the artifacts with bert_dedup_frac 1."""
    from ruart_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["batch_size"] = 8
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 8, seed=2)

    # plant duplication so the inverse gather is non-trivial
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr[k][:, 1:4] = ocr[k][:, 0:1]
    ocr["len"][:, 1:4] = ocr["len"][:, 0:1]
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)

    coll = Collator(Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 0}))
    B, N, Lb = ocr["bert"].shape
    dd = {"bert": ocr["bert"], "bert_mask": ocr["bert_mask"]}
    coll._add_dedup(dd, B, N, Lb)
    assert "bert_unique" in dd
    ocr_d = dict(ocr)
    ocr_d["bert_unique"] = dd["bert_unique"]
    ocr_d["bert_inverse"] = dd["bert_inverse"]
    jocr_d = jax.tree.map(jnp.asarray, ocr_d)

    fn = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
    )
    single_dedup = np.asarray(fn(params, jq, jocr_d, jod))
    single_dense = np.asarray(fn(params, jq, jocr, jod))
    np.testing.assert_allclose(single_dedup, single_dense, atol=2e-5)

    for tp in (1, 2):
        mesh = make_mesh(tp=tp)
        assert dd["bert_unique"].shape[0] % mesh.shape["dp"] == 0
        sp = shard_params(params, mesh)
        sq, socr_d, sod = shard_batch((jq, jocr_d, jod), mesh)
        mesh_dedup = np.asarray(fn(sp, sq, socr_d, sod))
        np.testing.assert_allclose(
            mesh_dedup, single_dedup, atol=2e-4, rtol=1e-4
        )


def test_collate_id_key_identity_fallback(shipped_conf_opt):
    """The collator packs each DISTINCT underlying id sequence once
    (glove/fasttext/phoc usually alias one word-id list); when a caller
    hands items whose per-key lists are equal-valued but distinct
    objects, every key must still pack correctly (the identity check
    falls back to independent fills)."""
    from tests.test_buckets import _mini_items

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    items = _mini_items(cfg, 2, n_cands=4)
    aliased = Collator(cfg)(items)

    # break aliasing: fresh list objects per key with DIFFERENT values
    import copy

    items2 = copy.deepcopy(items)
    for sample in items2:
        for it in sample["ocr"]:
            it["fasttext"] = [v + 1 for v in it["fasttext"]]
    out2 = Collator(cfg)(items2)
    np.testing.assert_array_equal(aliased[1]["glove"], out2[1]["glove"])
    mask = out2[1]["glove"] != 0
    np.testing.assert_array_equal(
        out2[1]["fasttext"][mask], aliased[1]["fasttext"][mask] + 1
    )


def test_dedup_joint_key_pools_on_uniques(shipped_conf_opt):
    """Pool-before-expand: with bert_offsets present the dedup key is the
    JOINT (pieces, offsets) row and the collator emits bert_unique_offsets;
    two candidates sharing a piece row but with DIFFERENT word spans must
    land in different unique rows (pooling happens on the unique table),
    and the full model must still match the dense path exactly."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)

    # candidates 1..3 duplicate candidate 0's strings; candidate 4 shares
    # candidate 0's PIECES but splits them differently into words
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr[k][:, 1:4] = ocr[k][:, 0:1]
    ocr["len"][:, 1:4] = ocr["len"][:, 0:1]
    ocr["bert"][:, 4] = ocr["bert"][:, 0]
    off = ocr["bert_offsets"]
    off[:, 4] = off[:, 0]
    # change the first word's span width (guaranteed different, still valid)
    st4, ed4 = off[:, 4, 0, 0], off[:, 4, 0, 1]
    off[:, 4, 0, 1] = np.where(ed4 - st4 >= 2, st4 + 1, st4 + 2)
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    dense = np.asarray(model.apply(params, jq, jocr, jod))

    coll = Collator(Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 0}))
    B, N, Lb = ocr["bert"].shape
    out = {
        "bert": ocr["bert"],
        "bert_mask": ocr["bert_mask"],
        "bert_offsets": ocr["bert_offsets"],
    }
    coll._add_dedup(out, B, N, Lb)
    assert "bert_unique" in out and "bert_unique_offsets" in out
    inv = out["bert_inverse"]
    # duplicates share a row; the differently-split candidate does NOT
    assert (inv[:, 1:4] == inv[:, 0:1]).all()
    assert (inv[:, 4] != inv[:, 0]).all()
    # each candidate's offsets are reconstructable from the unique table
    W = ocr["bert_offsets"].shape[2]
    rec = out["bert_unique_offsets"][inv.reshape(-1)][:, :W]
    np.testing.assert_array_equal(
        rec.reshape(ocr["bert_offsets"].shape), ocr["bert_offsets"]
    )

    ocr_d = dict(ocr)
    for k in ("bert_unique", "bert_inverse", "bert_unique_offsets"):
        ocr_d[k] = out[k]
    deduped = np.asarray(
        model.apply(params, jq, jax.tree.map(jnp.asarray, ocr_d), jod)
    )
    np.testing.assert_allclose(deduped, dense, atol=2e-5)
