"""Sequence packing of the deduped BERT candidate table (`bert_pack 1`).

Packing is EXACT: cross-segment keys carry the same -10000 additive bias a
pad key carries in the dense layout, which underflows to a hard zero after
the max-subtracted fp32 softmax, and positions restart per segment — so a
packed segment's encoder outputs equal the same sequence encoded as its own
row. These tests pin (a) the collator's packed-grid construction, (b) the
BertModel segment-mask equivalence, (c) the Pallas kernel's 2D-bias path,
and (d) full-model forward equality with the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def _pack_collator(opt, **kw):
    return Collator(Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 1, **kw}))


def _check_pack_grid(out, B, N, require_sharing=True):
    """Brute-force invariants of a packed grid: every row's tokens land
    contiguously with a distinct (row, segment) id, positions restart at
    0, and real tokens exist exactly where seg > 0."""
    packed = out["bert_packed"]
    seg = out["bert_packed_seg"]
    pos = out["bert_packed_pos"]
    unpack = out["bert_unpack"]
    R, Lp = packed.shape
    assert seg.shape == pos.shape == (R, Lp)

    flat_tok = packed.reshape(-1)
    flat_seg = seg.reshape(-1)
    flat_pos = pos.reshape(-1)
    inv = out["bert_inverse"]
    seen = set()
    for b in range(B):
        for n in range(N):
            orig = out["bert"][b, n]
            l = int((orig != 0).sum())
            idx = unpack[inv[b, n]]
            np.testing.assert_array_equal(flat_tok[idx[:l]], orig[:l])
            if l:
                # one segment id per candidate, contiguous from position 0
                segids = set(flat_seg[idx[:l]])
                assert len(segids) == 1 and 0 not in segids
                np.testing.assert_array_equal(flat_pos[idx[:l]], np.arange(l))
                seen.add((idx[0] // Lp, segids.pop()))
    assert ((flat_tok != 0) == (flat_seg != 0)).all()
    # no two distinct unique rows may share a (bin, segment) id: count
    # grid segments == count distinct (bin, seg) reached through unpack
    grid_segs = {
        (r, s)
        for r in range(R)
        for s in set(seg[r][seg[r] > 0].tolist())
    }
    assert seen == grid_segs
    if require_sharing:
        assert seg.max() >= 2  # packing actually packed


def test_pack_grid_reconstruction(shipped_conf_opt):
    """Every unique row's tokens land contiguously in the packed grid with
    a distinct (row, segment) id, positions restarting at 0 — fuzzed over
    seeds, pool sizes, and pack widths."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    for seed in range(8):
        rng = np.random.RandomState(seed)
        Lb = int(rng.randint(4, 16))
        pack_len = int(rng.choice([8, 16, 32]))
        B, N = int(rng.randint(2, 6)), int(rng.randint(4, 12))
        n_pool = int(rng.randint(3, 20))
        coll = _pack_collator(opt, bert_pack_len=pack_len)
        pool = np.zeros((n_pool, Lb), np.int32)
        for i in range(n_pool):
            l = rng.randint(0, Lb + 1)   # include empty rows
            pool[i, :l] = rng.randint(1, 60, size=l)
        out = {"bert": pool[rng.randint(0, n_pool, size=(B, N))]}
        out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
        coll._add_dedup(out, B, N, Lb)
        assert "bert_packed" in out and "bert_unique" not in out
        assert out["bert_packed"].shape[1] >= pack_len
        _check_pack_grid(out, B, N, require_sharing=seed == 0 and False)
    # the deterministic case from round-3 development keeps the sharing
    # assertion (rows really do co-habit)
    rng = np.random.RandomState(0)
    B, N, Lb = 4, 8, 10
    coll = _pack_collator(opt, bert_pack_len=16)
    pool = np.zeros((12, Lb), np.int32)
    for i in range(12):
        l = rng.randint(2, Lb + 1)
        pool[i, :l] = rng.randint(1, 60, size=l)
    out = {"bert": pool[rng.randint(0, 12, size=(B, N))]}
    out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
    coll._add_dedup(out, B, N, Lb)
    assert out["bert_packed"].shape[1] == 16
    _check_pack_grid(out, B, N, require_sharing=True)


def test_bert_segment_mask_matches_separate_rows():
    """Two sequences packed into one row encode exactly as two rows."""
    from ruart_tpu.models.bert.model import BertModel

    cfg = BertConfig.tiny(vocab_size=64, attention_impl="xla")
    model = BertModel(cfg)
    rng = np.random.RandomState(1)
    a = rng.randint(1, 60, size=5).astype(np.int32)
    b = rng.randint(1, 60, size=7).astype(np.int32)
    Lp = 16
    packed = np.zeros((1, Lp), np.int32)
    seg = np.zeros((1, Lp), np.int32)
    pos = np.zeros((1, Lp), np.int32)
    packed[0, :5], packed[0, 5:12] = a, b
    seg[0, :5], seg[0, 5:12] = 1, 2
    pos[0, :5], pos[0, 5:12] = np.arange(5), np.arange(7)

    dense_ids = np.zeros((2, Lp), np.int32)
    dense_ids[0, :5], dense_ids[1, :7] = a, b
    dense_mask = (dense_ids != 0).astype(np.int32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(dense_ids))
    dense_layers, _ = model.apply(
        params, jnp.asarray(dense_ids), jnp.asarray(dense_mask)
    )
    packed_layers, _ = model.apply(
        params, jnp.asarray(packed),
        segment_ids=jnp.asarray(seg), position_ids=jnp.asarray(pos),
    )
    dense_layers = np.asarray(dense_layers)
    packed_layers = np.asarray(packed_layers)
    np.testing.assert_allclose(
        packed_layers[:, 0, :5], dense_layers[:, 0, :5], atol=1e-5
    )
    np.testing.assert_allclose(
        packed_layers[:, 0, 5:12], dense_layers[:, 1, :7], atol=1e-5
    )


def test_kernel_bias2d_matches_xla():
    """grouped_attention with a [B, L, L] additive bias (interpret mode)
    equals the einsum reference."""
    from ruart_tpu.ops.attention import attention_rows_xla, grouped_attention

    rng = np.random.RandomState(2)
    B, L, H, dh = 6, 16, 4, 8
    D = H * dh
    q, k, v = (rng.randn(B, L, D).astype(np.float32) for _ in range(3))
    seg = rng.randint(0, 3, size=(B, L)).astype(np.int32)  # 0 = pad
    same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
    bias2d = ((1.0 - same.astype(np.float32)) * -10000.0).astype(np.float32)

    ref = np.asarray(
        attention_rows_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias2d), H,
        )
    )
    out = np.asarray(
        grouped_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias2d), heads=H, group=4, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pack_matches_dense_full_model(shipped_conf_opt):
    """Full-model forward with the packed table equals the dense path."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)

    # plant duplication so both dedup and packing are non-trivial
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr[k][:, 1:4] = ocr[k][:, 0:1]
    ocr["len"][:, 1:4] = ocr["len"][:, 0:1]
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    dense = np.asarray(model.apply(params, jq, jocr, jod))

    coll = _pack_collator(opt, bert_pack_len=16)
    B, N, Lb = ocr["bert"].shape
    out = {"bert": ocr["bert"], "bert_mask": ocr["bert_mask"]}
    coll._add_dedup(out, B, N, Lb)
    assert "bert_packed" in out
    ocr_p = dict(ocr)
    for k in ("bert_packed", "bert_packed_seg", "bert_packed_pos",
              "bert_unpack", "bert_inverse"):
        ocr_p[k] = out[k]
    packed = np.asarray(
        model.apply(params, jq, jax.tree.map(jnp.asarray, ocr_p), jod)
    )
    np.testing.assert_allclose(packed, dense, atol=2e-5)


def test_pack_on_mesh_matches_dense_and_single_device(shipped_conf_opt):
    """The dp-sharded packed-table path (bert_packed/_seg/_pos [R, Lp] and
    bert_unpack [cap, Lw] sharded on dim 0, gathered back across shards by
    GSPMD) must equal both the dense mesh forward and the single-device
    packed forward — the packing analogue of the dedup-on-mesh test."""
    from ruart_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["batch_size"] = 8
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 8, seed=2)

    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr[k][:, 1:4] = ocr[k][:, 0:1]
    ocr["len"][:, 1:4] = ocr["len"][:, 0:1]
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)

    model = RUArtModel(spec)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)

    coll = _pack_collator(opt, bert_pack_len=16)
    B, N, Lb = ocr["bert"].shape
    dd = {"bert": ocr["bert"], "bert_mask": ocr["bert_mask"]}
    coll._add_dedup(dd, B, N, Lb)
    assert "bert_packed" in dd
    ocr_p = dict(ocr)
    for k in ("bert_packed", "bert_packed_seg", "bert_packed_pos",
              "bert_unpack", "bert_inverse"):
        ocr_p[k] = dd[k]
    jocr_p = jax.tree.map(jnp.asarray, ocr_p)

    fn = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
    )
    single_pack = np.asarray(fn(params, jq, jocr_p, jod))
    single_dense = np.asarray(fn(params, jq, jocr, jod))
    np.testing.assert_allclose(single_pack, single_dense, atol=2e-5)

    for tp in (1, 2):
        mesh = make_mesh(tp=tp)
        for k in ("bert_packed", "bert_unpack"):
            assert dd[k].shape[0] % mesh.shape["dp"] == 0
        sp = shard_params(params, mesh)
        sq, socr_p, sod = shard_batch((jq, jocr_p, jod), mesh)
        mesh_pack = np.asarray(fn(sp, sq, socr_p, sod))
        np.testing.assert_allclose(
            mesh_pack, single_pack, atol=2e-4, rtol=1e-4
        )


def test_serve_warmup_and_predict_packed(shipped_conf_opt):
    """With `bert_pack 1` the serving engine warms up packed-table
    signatures (shapes only) and serves real traffic through the packed
    collator path."""
    from tests.test_serve import _requests, _tiny_engine

    engine = _tiny_engine(
        shipped_conf_opt, extra={"bert_dedup_frac": 1.0, "bert_pack": 1}
    )
    assert engine.collator.pack
    n = engine.warmup(max_programs=6)
    assert n >= 1
    res = engine.predict(_requests(3))
    assert len(res) == 3
    for r in res:
        assert isinstance(r["answer"], str) and r["answer"]
        assert np.isfinite(r["score"])
    # calibrated warmup's dense fallback strips every packed key
    assert engine.warmup_calibrated(_requests(2)) >= 2
    # int8 weight-only encoder composes with packing
    engine.quantize()
    res = engine.predict(_requests(2))
    assert len(res) == 2 and all(np.isfinite(r["score"]) for r in res)


def test_pack_grads_match_dense(shipped_conf_opt):
    """Loss and parameter GRADIENTS with the packed table equal the dense
    path — gradients flow correctly through the packed-grid unpack gather
    (its transpose is a scatter-add into the shared rows) and into a
    TRAINABLE encoder (lock_bert off). Gradients, not post-optimizer
    params: Adamax-style updates normalize by max|grad|, so on the tiny
    near-zero-grad init they amplify fp reassociation noise (~1e-9) into
    O(lr) param divergence — measured, not hypothetical."""
    from ruart_tpu.train.loss import make_loss_fn

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.pop("LOCK_BERT", None)   # key-present semantics: remove to unlock
    opt.update({"DROPOUT": 0.0, "dropout_emb": 0.0})
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    assert not spec.lock_bert
    model = RUArtModel(spec)
    q, ocr_np, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)
    q, od = (jax.tree.map(jnp.asarray, t) for t in (q, od))
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        ocr_np[k][:, 1:3] = ocr_np[k][:, 0:1]
    ocr_np["len"][:, 1:3] = ocr_np["len"][:, 0:1]
    ocr_np["bert_mask"] = (ocr_np["bert"] != 0).astype(np.int32)

    coll = _pack_collator(dict(shipped_conf_opt), bert_pack_len=16)
    B, N, Lb = ocr_np["bert"].shape
    dd = {"bert": ocr_np["bert"], "bert_mask": ocr_np["bert_mask"]}
    coll._add_dedup(dd, B, N, Lb)
    assert "bert_packed" in dd
    ocr_p = dict(ocr_np)
    for k in ("bert_packed", "bert_packed_seg", "bert_packed_pos",
              "bert_unpack", "bert_inverse"):
        ocr_p[k] = dd[k]

    jocr_d = jax.tree.map(jnp.asarray, ocr_np)
    jocr_p = jax.tree.map(jnp.asarray, ocr_p)
    params = model.init(jax.random.PRNGKey(0), q, jocr_d, od)

    tgt = np.zeros((2, cfg.max_ocr_num + 1), dtype=np.float32)
    tgt[:, 1] = 1.0
    tgt = jnp.asarray(tgt)
    loss_fn = make_loss_fn("BCE_D1")

    def lossf(p, o):
        return loss_fn(model.apply(p, q, o, od, deterministic=True), tgt)

    loss_d, g_dense = jax.value_and_grad(lossf)(params, jocr_d)
    loss_p, g_pack = jax.value_and_grad(lossf)(params, jocr_p)
    np.testing.assert_allclose(float(loss_p), float(loss_d), atol=1e-5)
    flat_d = jax.tree_util.tree_leaves_with_path(g_dense)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pack))
    for path, vd in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(vd), atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    # the encoder must actually receive gradient (lock_bert off), else
    # this proved nothing about gradients through the unpack gather
    assert any(
        "Bert" in jax.tree_util.keystr(path)
        and float(jnp.abs(vp).max()) > 0
        for path, vp in flat_p.items()
    ), "no gradient reached the encoder — lock_bert still on?"


def test_pack_e2e_train_eval_predict(tmp_path, shipped_conf_opt):
    """Full trainer slice with packing forced on (bert_dedup_frac 1 +
    bert_pack 1): train steps produce finite losses, eval runs, and
    predict writes a complete submission — the packed collator path
    through the real Trainer/evaluator, not hand-built batches."""
    import json
    import os

    import msgpack

    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.train.trainer import Trainer

    for label, n, seed in (("train", 8, 0), ("val", 4, 1), ("test", 6, 2)):
        raw = make_synthetic_raw_dataset(
            n, seed=seed, with_answers=label != "test"
        )
        with open(tmp_path / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update({
        "Task": "train,val,test",
        "datadir": str(tmp_path),
        "FEATURE_FOLDER": str(tmp_path / "features"),
        "train_FILE": "train.msgpack",
        "val_FILE": "val.msgpack",
        "test_FILE": "test.msgpack",
        "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
        "preprocess_od_name": "OD_bottom-up",
        "batch_size": 4,
        "epoch": 1,
        "bert_dedup_frac": 1.0,
        "bert_pack": 1,
        "bert_pack_len": 16,
    })
    cfg = Config(opt)
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=100, log_every=2)
    assert trainer.collator.pack  # setup_model built the packed collator
    assert trainer.updates >= 2

    opt2 = dict(cfg.opt)
    opt2["RESUME"] = True
    opt2["MODEL_PATH"] = os.path.relpath(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"),
        str(tmp_path),
    )
    t2 = Trainer(Config(opt2), bert_config=BertConfig.tiny(vocab_size=64))
    t2.predict_for_test()
    sub = json.load(open(os.path.join(t2.save_folder, "submission.json")))
    assert len(sub) == 6
    for r in sub:
        assert isinstance(r["answer"], str)


def test_pack_row_ladder(shipped_conf_opt):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    coll = _pack_collator(opt)
    assert coll.pack_row_ladder(64) == (8, 16, 32, 64)
    assert coll.pack_row_ladder(8) == (8,)
    coll2 = _pack_collator(opt, bert_pack_buckets=2)
    assert coll2.pack_row_ladder(64) == (32, 64)
