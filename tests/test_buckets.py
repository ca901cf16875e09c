"""Length-bucketed compilation (SURVEY §3.5 #5, `VQA_Dataset.py:476-517`):
short batches pad to the smallest fitting bucket instead of the conf caps,
with a FIXED bucket ladder so the compiled-program count stays bounded."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator, _parse_buckets, _pick_bucket
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def test_parse_buckets():
    assert _parse_buckets(None, 100) == (100,)
    assert _parse_buckets(3, 100) == (25, 50, 100)
    assert _parse_buckets("25,50", 100) == (25, 50, 100)
    assert _parse_buckets(4, 100, floor=12) == (13, 25, 50, 100)
    assert _pick_bucket((25, 50, 100), 30) == 50
    assert _pick_bucket((25, 50, 100), 150) == 100  # clamp to cap


def test_halving_ladder():
    from ruart_tpu.data.collate import _halving_ladder

    assert _halving_ladder(50, 2, 8, 8) == (32, 50)
    assert _halving_ladder(30, 2, 8, 8) == (16, 30)
    assert _halving_ladder(10, 2, 8, 8) == (10,)  # 8 saves <25%: skipped
    assert _halving_ladder(20, 3, 4, 4) == (8, 12, 20)
    assert _halving_ladder(10, 3, 4, 4) == (4, 10)
    assert _halving_ladder(100, 1, 8, 8) == (100,)


def _mini_items(cfg, n_items, n_cands, n_words=2, seed=0):
    """Hand-built collator inputs with n_cands candidates per item."""
    rng = np.random.RandomState(seed)

    def cand():
        w = n_words
        ids = rng.randint(5, 40, size=w).tolist()
        pieces = [2] + rng.randint(5, 40, size=w).tolist() + [3]
        return {
            "glove": ids, "fasttext": ids,
            "pos": rng.randint(0, 5, size=w).tolist(),
            "ent": rng.randint(0, 5, size=w).tolist(),
            "bert": pieces,
            "bert_offsets": [(1 + j, 2 + j) for j in range(w)],
            "position": rng.rand(8).tolist(),
        }

    def item():
        qw = 3
        return {
            "q": {
                "glove": rng.randint(5, 40, size=qw).tolist(),
                "fasttext": rng.randint(5, 40, size=qw).tolist(),
                "pos": rng.randint(0, 5, size=qw).tolist(),
                "ent": rng.randint(0, 5, size=qw).tolist(),
                "bert": [2] + rng.randint(5, 40, size=qw).tolist() + [3],
                "bert_offsets": [(1 + j, 2 + j) for j in range(qw)],
            },
            "ocr": [cand() for _ in range(n_cands)],
            "od": [cand() for _ in range(2)],
            "gt": {"values": [0.0] * n_cands, "no_answer": 1.0},
            "extra_info": {},
        }

    return [item() for _ in range(n_items)]


def test_bucketed_shapes_and_gt_width(shipped_conf_opt):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["bucket_ocr_num"] = 3         # (es_floor.., 6, 12) from cap 12
    opt["bucket_ocr_bert_len"] = "6"  # (6, 10)
    cfg = Config(opt)
    coll = Collator(cfg)
    assert coll.ocr_num_buckets[-1] == cfg.max_ocr_num
    assert coll.ocr_len_buckets == (6, 10)

    short = coll(_mini_items(cfg, 2, n_cands=5))
    q, ocr, od, gt, extra = short
    n_bucket = ocr["bert"].shape[1]
    assert n_bucket < cfg.max_ocr_num
    assert n_bucket in coll.ocr_num_buckets
    assert ocr["bert"].shape[2] == 6
    # score width tracks the bucket (no-answer slot preserved)
    assert gt.shape[1] == cfg.dims.num_scores - cfg.max_ocr_num + n_bucket
    assert (gt[:, -1] == 1.0).all()

    # a long batch still lands on the cap bucket
    long = coll(_mini_items(cfg, 2, n_cands=cfg.max_ocr_num))
    assert long[1]["bert"].shape[1] == cfg.max_ocr_num


def test_bucketed_scores_match_cap_padded(shipped_conf_opt):
    """Bucketed batches must preserve the decode (argmax) and stay close in
    probability. Exact equality is impossible BY REFERENCE CONSTRUCTION:
    `Layers.py:168` layer-norms over the whole padded tensor and the
    backward LSTM consumes pad rows (`Layers.py:166`), so scores are
    functions of the pad width — which is why bucketing ships opt-in and
    parity-gated runs keep the single cap bucket (docs/PARITY.md)."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    items = _mini_items(cfg, 2, n_cands=5)

    dense = Collator(Config(opt))(items)
    opt_b = dict(opt, bucket_ocr_num=3, bucket_ocr_bert_len="6")
    bucketed = Collator(Config(opt_b))(items)
    nb = bucketed[1]["bert"].shape[1]
    assert nb < cfg.max_ocr_num

    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    model = RUArtModel(spec)
    jd = [jax.tree.map(jnp.asarray, t) for t in dense[:3]]
    jb = [jax.tree.map(jnp.asarray, t) for t in bucketed[:3]]
    params = model.init(jax.random.PRNGKey(0), *jd)
    s_dense = np.asarray(model.apply(params, *jd))
    s_bucket = np.asarray(model.apply(params, *jb))

    # decode-level agreement + bounded drift on the candidate columns;
    # dropped pad columns carried exactly-zero probability in the dense run
    assert (s_bucket[:, :nb].argmax(-1) == s_dense[:, :nb].argmax(-1)).all()
    np.testing.assert_allclose(s_bucket[:, :nb], s_dense[:, :nb], atol=0.12)
    np.testing.assert_allclose(s_bucket[:, -1], s_dense[:, -1], atol=0.12)
    np.testing.assert_allclose(s_dense[:, nb:-1], 0.0, atol=1e-8)


def test_bucket_ladder_bounds_compile_count(shipped_conf_opt):
    """Mixed-length batch stream: the number of distinct jit signatures is
    bounded by the bucket-ladder product, not the number of batches."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["bucket_ocr_num"] = 3
    cfg = Config(opt)
    coll = Collator(cfg)

    shapes = set()
    rng = np.random.RandomState(0)
    for i in range(12):
        n = int(rng.randint(4, cfg.max_ocr_num + 1))
        q, ocr, od, gt, _ = coll(_mini_items(cfg, 2, n_cands=n, seed=i))
        shapes.add(tuple(ocr["bert"].shape))
    assert len(shapes) <= len(coll.ocr_num_buckets) * len(coll.ocr_len_buckets)
    assert len(shapes) >= 2  # the stream actually exercised several buckets


def test_exact_buckets_match_caps(shipped_conf_opt):
    """The default (always-on) exact buckets — question-BERT width and the
    candidate word axis — must reproduce the cap-padded scores EXACTLY
    (unlike the opt-in candidate-count buckets above, whose drift is
    reference-inherent): per-position embeds, mask-attended pre-align and
    the forward-only multi2one last-valid state all ignore trailing pad."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(max_ocr_len=12, max_od_len=8, max_q_bert_len=24)
    cfg = Config(opt)
    items = _mini_items(cfg, 2, n_cands=5)

    auto = Collator(cfg)(items)
    pinned = Collator(
        Config(dict(opt, bucket_q_bert_len=1, bucket_word_len=1))
    )(items)
    # short items landed in sub-cap buckets
    assert auto[1]["glove"].shape[2] == 4
    assert auto[2]["glove"].shape[2] == 4
    assert auto[0]["bert"].shape[1] == 16
    assert pinned[1]["glove"].shape[2] == 12
    assert pinned[0]["bert"].shape[1] == 24

    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    model = RUArtModel(spec)
    ja = [jax.tree.map(jnp.asarray, t) for t in auto[:3]]
    jp = [jax.tree.map(jnp.asarray, t) for t in pinned[:3]]
    params = model.init(jax.random.PRNGKey(0), *jp)
    s_pin = np.asarray(model.apply(params, *jp))
    s_auto = np.asarray(model.apply(params, *ja))
    assert (s_auto.argmax(-1) == s_pin.argmax(-1)).all()
    np.testing.assert_allclose(s_auto, s_pin, atol=1e-5)


def test_word_bucket_gated_for_bidir_multi2one(shipped_conf_opt):
    """multi2one_bidir runs its backward LSTM through trailing pads
    (reference-inherent pad sensitivity), so the word-axis trim must
    disable itself; the exact q-BERT trim stays on."""
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["max_ocr_len"] = 12
    assert Collator(Config(opt)).ocr_word_buckets == (4, 8, 12)
    opt2 = dict(opt, multi2one_bidir=True)
    coll2 = Collator(Config(opt2))
    assert coll2.ocr_word_buckets == (12,)
    assert len(coll2.q_bert_buckets) > 1


def test_collator_matches_naive_reference(shipped_conf_opt):
    """Property test: the vectorized collator (fromiter walks, identity
    key-dedup, boolean-mask scatters) must equal a naive per-element loop
    implementation of the documented packing semantics, on random ragged
    items — buckets pinned to the caps so shapes are deterministic."""
    rng = np.random.RandomState(7)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        bucket_q_bert_len=1, bucket_word_len=1, bert_dedup_frac=0,
        max_ocr_num=6, max_od_num=4, max_ocr_len=5, max_od_len=5,
        max_ocr_bert_len=9, max_od_bert_len=9,
    )
    cfg = Config(opt)
    coll = Collator(cfg)

    def rand_cand():
        w = rng.randint(1, 8)  # may exceed max_*_len -> truncation path
        ids = rng.randint(5, 40, size=w).tolist()
        npieces = rng.randint(1, 10)
        pieces = [2] + rng.randint(5, 40, size=npieces).tolist() + [3]
        offs, p = [], 1
        for _ in range(w):
            ln = rng.randint(0, 3)
            offs.append((p, p + ln))
            p += ln
        return {
            "glove": ids, "fasttext": ids,
            "pos": rng.randint(0, 5, size=w).tolist(),
            "ent": rng.randint(0, 5, size=w).tolist(),
            "bert": pieces,
            "bert_offsets": offs,
            "position": rng.rand(8).tolist(),
        }

    def rand_item():
        qw = rng.randint(1, 5)
        return {
            "q": {
                "glove": rng.randint(5, 40, size=qw).tolist(),
                "fasttext": rng.randint(5, 40, size=qw).tolist(),
                "pos": rng.randint(0, 5, size=qw).tolist(),
                "ent": rng.randint(0, 5, size=qw).tolist(),
                "bert": [2] + rng.randint(5, 40, size=qw).tolist() + [3],
                "bert_offsets": [(1 + j, 1 + j) for j in range(qw)],
            },
            "ocr": [rand_cand() for _ in range(rng.randint(1, 9))],
            "od": [rand_cand() for _ in range(rng.randint(1, 6))],
            "gt": None,
            "extra_info": {},
        }

    def naive_block(batch_items, max_num, max_len, max_bert_len):
        B = len(batch_items)
        out = {
            "num": np.zeros(B, np.int32),
            "len": np.zeros((B, max_num), np.int32),
            "position": np.zeros((B, max_num, 8), np.float32),
            "bert": np.zeros((B, max_num, max_bert_len), np.int32),
            "bert_offsets": np.zeros((B, max_num, max_len, 2), np.int32),
        }
        for k in ("glove", "fasttext", "pos", "ent"):
            out[k] = np.zeros((B, max_num, max_len), np.int32)
        for b, items in enumerate(batch_items):
            items = list(items)[:max_num]
            out["num"][b] = len(items)
            for c, it in enumerate(items):
                for k in ("glove", "fasttext", "pos", "ent"):
                    row = it[k][:max_len]
                    out[k][b, c, : len(row)] = row
                out["len"][b, c] = min(len(it["glove"]), max_len)
                out["position"][b, c] = it["position"]
                bert = it["bert"][:max_bert_len]
                out["bert"][b, c, : len(bert)] = bert
                for w, (st, ed) in enumerate(it["bert_offsets"][:max_len]):
                    st2 = min(st, max_bert_len - 1)
                    ed2 = max(min(ed, max_bert_len), st2)
                    out["bert_offsets"][b, c, w] = (st2, ed2)
        out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
        return out

    for trial in range(5):
        items = [rand_item() for _ in range(rng.randint(1, 5))]
        got_q, got_ocr, got_od, got_gt, _ = coll(items)
        want_ocr = naive_block(
            [t["ocr"] for t in items], cfg.max_ocr_num, cfg.max_ocr_len,
            cfg.max_ocr_bert_len,
        )
        want_od = naive_block(
            [t["od"] for t in items], cfg.max_od_num, cfg.max_od_len,
            cfg.max_od_bert_len,
        )
        for want, got in ((want_ocr, got_ocr), (want_od, got_od)):
            for k, v in want.items():
                np.testing.assert_array_equal(got[k], v, err_msg=k)
