import os

import msgpack
import numpy as np
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.data.collate import Collator
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.pipeline import batch_iterator, prefetch
from ruart_tpu.data.preprocess import Preprocessor
from ruart_tpu.data.sampler import VQASampler
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

from tests.test_fusion_model import TINY_OVERRIDES


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory, shipped_conf_opt):
    root = tmp_path_factory.mktemp("data")
    for label, n, seed in (("train", 30, 0), ("val", 10, 1), ("test", 8, 2)):
        raw = make_synthetic_raw_dataset(n, seed=seed, with_answers=label != "test")
        with open(root / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train,val,test",
            "datadir": str(root),
            "FEATURE_FOLDER": str(root / "features"),
            "train_FILE": "train.msgpack",
            "val_FILE": "val.msgpack",
            "test_FILE": "test.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
        }
    )
    cfg = Config(opt)
    pre = Preprocessor(cfg)
    pre.ensure_preprocessed()
    vocab, char_vocab, emb = pre.load_data()
    return cfg, pre, vocab, char_vocab, emb, root


def _load_split(cfg, label):
    path = os.path.join(cfg.opt["FEATURE_FOLDER"], f"{label}-preprocessed.msgpack")
    with open(path, "rb") as f:
        return msgpack.unpack(f, raw=False, strict_map_key=False)


def test_preprocess_outputs(pipeline_env):
    cfg, pre, vocab, char_vocab, emb, root = pipeline_env
    assert vocab[:5] == ["<PAD>", "<UNK>", "<Q>", "<OCR>", "<OD>"]
    assert "glove_embedding" in emb and "fast_embedding" in emb
    assert emb["glove_embedding"].shape[0] == len(vocab)
    assert np.all(emb["glove_embedding"][0] == 0)
    train = _load_split(cfg, "train")
    assert len(train["data"]) == 30
    d = train["data"][0]
    assert "annotated_question" in d and "wordid" in d["annotated_question"]
    assert "ocr_PMTD_ASTER_gram2" in d
    # n-gram candidates have merged boxes + ANLS/ACC
    if d["ocr_PMTD_ASTER_gram2"]:
        g = d["ocr_PMTD_ASTER_gram2"][0]
        assert "ANLS" in g and len(g["pos"]) == 8
        assert len(g["word"]["wordid"]) >= 2
    # box normalization
    for item in d["ocr_PMTD_ASTER"]:
        assert all(0 <= v <= 1.001 for v in item["pos"])


def test_vocab_shared_across_splits(pipeline_env):
    cfg, pre, vocab, *_ = pipeline_env
    w2id = {w: i for i, w in enumerate(vocab)}
    test = _load_split(cfg, "test")
    for d in test["data"][:3]:
        for wid, w in zip(
            d["annotated_question"]["wordid"], d["annotated_question"]["word"]
        ):
            if w in w2id:
                assert wid == w2id[w]


def test_dataset_and_collate_shapes(pipeline_env):
    cfg, pre, vocab, *_ = pipeline_env
    tok = WordPieceTokenizer(build_demo_vocab())
    train = _load_split(cfg, "train")
    ds = VQADataset(train["data"], cfg, mode="train", tokenizer=tok)
    assert len(ds) > 0
    item = ds[0]
    # ES candidates first, sentinel last
    assert item["extra_info"]["ocr_list"][-1] == "<OCR>"
    assert item["gt"] is not None

    coll = Collator(cfg)
    q, ocr, od, gt, extra = coll([ds[i] for i in range(4)])
    B, N, L = 4, cfg.max_ocr_num, cfg.max_ocr_len
    assert ocr["fasttext"].shape == (B, N, L)
    assert ocr["bert"].shape == (B, N, cfg.max_ocr_bert_len)
    assert ocr["bert_offsets"].shape == (B, N, L, 2)
    assert ocr["position"].shape == (B, N, 8)
    assert ocr["num"].max() <= N and ocr["num"].min() >= 1
    assert q["glove"].shape == (B, cfg.max_q_len)
    assert gt.shape == (B, cfg.dims.num_scores)
    # mask semantics: id != 0
    assert ((ocr["fasttext"] != 0).sum(-1) >= ocr["len"]).all()
    # sentinel <OCR> word id is 3
    for b in range(B):
        n = ocr["num"][b] - 1
        assert ocr["fasttext"][b, n, 0] == 3


def test_label_threshold_policy(pipeline_env):
    cfg, pre, vocab, *_ = pipeline_env
    tok = WordPieceTokenizer(build_demo_vocab())
    train = _load_split(cfg, "train")
    ds = VQADataset(train["data"], cfg, mode="train", tokenizer=tok)
    coll = Collator(cfg)
    q, ocr, od, gt, extra = coll([ds[i] for i in range(len(ds))])
    # lable_all_with_threshold: every label is 0 or >= 0.5
    body = gt[:, :-1]
    assert ((body == 0) | (body >= 0.5)).all()
    # no-answer bit set iff max candidate score < 0.1
    for b in range(gt.shape[0]):
        assert gt[b, -1] == (1.0 if body[b].max() < 0.1 else 0.0)


def test_sampler_semantics():
    s = VQASampler(10, 4, train=True, epoch=2)
    batches = list(s)
    assert len(s) == 5  # 10*2/4
    assert len(batches) == 5
    assert all(len(b) == 4 for b in batches)
    # determinism
    s2 = VQASampler(10, 4, train=True, epoch=2)
    assert list(s2) == batches
    # resume skips the first batch_st batches
    s3 = VQASampler(10, 4, train=True, epoch=2, batch_st=2)
    assert list(s3) == batches[2:]
    # eval: ceil coverage, sequential
    se = VQASampler(10, 4, train=False)
    eb = list(se)
    assert len(eb) == 3
    assert eb[0] == [0, 1, 2, 3]
    assert eb[2] == [8, 9, 0, 1]  # wrap-around fill


def test_batch_iterator_and_prefetch(pipeline_env):
    cfg, pre, vocab, *_ = pipeline_env
    tok = WordPieceTokenizer(build_demo_vocab())
    train = _load_split(cfg, "train")
    ds = VQADataset(train["data"], cfg, mode="train", tokenizer=tok)
    sampler = VQASampler(len(ds), 4, train=True, epoch=1)
    coll = Collator(cfg)
    n = 0
    for batch in prefetch(batch_iterator(ds, sampler, coll, num_workers=2), size=2):
        q, ocr, od, gt, extra = batch
        assert gt is not None
        n += 1
    assert n == len(sampler)


def test_worker_pool_items_match_serial(pipeline_env):
    """The `num_worker` process pool must be value-transparent: every batch
    it yields is byte-identical to the serial path (item building is pure
    python/numpy over preprocessed data)."""
    import numpy as np

    cfg, pre, vocab, *_ = pipeline_env
    tok = WordPieceTokenizer(build_demo_vocab())
    train = _load_split(cfg, "train")
    ds = VQADataset(train["data"], cfg, mode="train", tokenizer=tok)
    coll = Collator(cfg)

    def run(workers):
        sampler = VQASampler(len(ds), 4, train=True, epoch=1)
        return list(batch_iterator(ds, sampler, coll, num_workers=workers))

    for serial, pooled in zip(run(0), run(2)):
        for a, b in zip(serial, pooled):
            if a is None or isinstance(a, list):
                assert a == b  # extra_info python metadata round-trips
                continue
            keys_a = sorted(a) if isinstance(a, dict) else None
            if keys_a is not None:
                assert keys_a == sorted(b)
                for k in keys_a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                np.testing.assert_array_equal(a, b)


def test_preprocessed_schema_completeness(pipeline_env):
    """Artifact schema parity: annotated tokens carry the reference's full
    field set (word/lemma/pos/pos_id/ent/ent_id/offsets/sentences/wordid/
    charid) plus raw_question_offsets (`CoQAPreprocess.py:566-617`)."""
    cfg, pre, vocab, char_vocab, emb, root = pipeline_env
    train = _load_split(cfg, "train")
    d = train["data"][0]
    ann = d["annotated_question"]
    for field in ("word", "lemma", "pos", "pos_id", "ent", "ent_id",
                  "offsets", "sentences", "wordid", "charid"):
        assert field in ann, field
    n = len(ann["word"])
    assert len(ann["charid"]) == n
    # charid rows bracketed with <STA>/<END>
    sta = char_vocab.index("<STA>")
    end = char_vocab.index("<END>")
    assert all(row[0] == sta and row[-1] == end for row in ann["charid"])
    assert len(d["raw_question_offsets"]) == n


def test_collate_never_mutates_items(pipeline_env):
    """The dataset shares id lists BY REFERENCE into items (and the
    tokenizer shares cached bertify tuples), so the collator and label
    build must treat item contents as read-only — this pins that
    contract: a deep snapshot of the items (and the underlying datum
    annotations) is identical after repeated collation."""
    import copy

    cfg, pre, vocab, char_vocab, emb, root = pipeline_env
    data = _load_split(cfg, "train")["data"]
    tok = WordPieceTokenizer(build_demo_vocab())
    ds = VQADataset(data, cfg, mode="train", tokenizer=tok)
    items = [ds[i] for i in range(min(6, len(ds)))]
    snap_items = copy.deepcopy(items)
    snap_datum = copy.deepcopy(ds.data[0])
    coll = Collator(cfg)
    for _ in range(2):
        coll(items)
    assert items == snap_items
    assert ds.data[0] == snap_datum


def test_preprocessor_repeat_and_vocab_swap_exact():
    """The specialized bigram synthesis and batched box normalization must
    be pure optimizations: repeated featurization gives identical results,
    and swapping the vocab recomputes ids rather than serving stale ones."""
    from ruart_tpu.core.presets import stvqa_config

    raw = make_synthetic_raw_dataset(6, seed=7, with_answers=False)
    cfg = stvqa_config(
        vocab_size=500,
        batch_size=4,
        preprocess_ocr_name="ocr_PMTD_ASTER,ES_ocr",
        preprocess_od_name="OD_bottom-up",
    )
    cfg.opt["datadir"] = "."
    cfg.opt["FEATURE_FOLDER"] = "."
    pre = Preprocessor(cfg)
    data_cold = pre._process_data(raw["data"])
    pre.train_vocab = pre._build_vocab(data_cold)
    pre.train_char_vocab = pre._build_char_vocab(pre.train_vocab)
    pre._assign_ids(data_cold)

    # repeat pass: results identical
    data_warm = pre._process_data(raw["data"])
    pre._assign_ids(data_warm)
    for a, b in zip(data_cold, data_warm):
        assert a["annotated_question"]["wordid"] == b["annotated_question"]["wordid"]
        for name in ("ocr_PMTD_ASTER", "ES_ocr"):
            assert [t["word"]["wordid"] for t in a[name]] == [
                t["word"]["wordid"] for t in b[name]
            ]
            assert [t["word"]["charid"] for t in a[name]] == [
                t["word"]["charid"] for t in b[name]
            ]

    # a NEW vocab object must invalidate the memo: ids follow the new ids
    rot = pre.train_vocab[:5] + pre.train_vocab[5:][::-1]
    assert sorted(rot) == sorted(pre.train_vocab)
    pre.train_vocab = rot
    data_rot = pre._process_data(raw["data"])
    pre._assign_ids(data_rot)
    w2id = {w: i for i, w in enumerate(rot)}
    for d in data_rot:
        ann = d["annotated_question"]
        assert ann["wordid"] == [w2id.get(w, 1) for w in ann["word"]]
        for t in d["ocr_PMTD_ASTER"]:
            assert t["word"]["wordid"] == [
                w2id.get(w, 1) for w in t["word"]["word"]
            ]


def test_normalize_boxes_corpus_matches_per_group():
    """The one-divide corpus normalization must equal the per-group path
    bit-for-bit, including ragged (len != 8) and non-numeric fallbacks."""
    from ruart_tpu.data.preprocess import (
        _normalize_boxes_batch,
        _normalize_boxes_corpus,
    )

    rng = np.random.RandomState(7)
    names = ["A", "B"]
    raw = []
    for i in range(6):
        W, H = int(rng.randint(100, 2000)), int(rng.randint(100, 2000))
        datum = {"image_width": W, "image_height": H}
        for name in names:
            items = [
                {"pos": [float(v) for v in rng.randint(0, 2000, 8)]}
                for _ in range(int(rng.randint(0, 7)))
            ]
            if i == 2 and name == "B":
                items.append({"pos": [1.0] * 9})      # ragged group
            if i == 4 and name == "A":
                items.append({})                      # missing pos -> zeros
            datum[name] = items
        raw.append(datum)

    got = _normalize_boxes_corpus(raw, names)
    k = 0
    for datum in raw:
        W, H = datum["image_width"], datum["image_height"]
        for name in names:
            assert got[k] == _normalize_boxes_batch(datum[name], W, H)
            k += 1
    assert k == len(got)

    # a non-numeric quad raises in both paths (normalize_ocr_box TypeError)
    raw[1]["A"] = [{"pos": ["x"] + [0.0] * 7}, {"pos": [2.0] * 8}]
    with pytest.raises(TypeError):
        _normalize_boxes_batch(raw[1]["A"], 10, 10)
    with pytest.raises(TypeError):
        _normalize_boxes_corpus(raw, names)


def test_native_collate_matches_python(pipeline_env):
    """The _ruart_fastcollate extension must produce byte-identical batches
    to the pure-Python path on every key, incl. dedup/pack artifacts and
    offset clipping."""
    from ruart_tpu.data import collate as C

    if C._FC is None:
        pytest.skip("native fastcollate unavailable")
    cfg0, pre, vocab, *_ = pipeline_env
    cfg = Config(dict(cfg0.opt))
    cfg.opt["bert_pack"] = 1
    cfg.opt["bert_dedup_frac"] = 1
    tok = WordPieceTokenizer(build_demo_vocab())
    train = _load_split(cfg, "train")
    ds = VQADataset(train["data"], cfg, mode="train", tokenizer=tok)
    items = [ds[i % len(ds)] for i in range(9)]
    native = Collator(cfg)(items)
    fc = C._FC
    C._FC = None
    try:
        pure = Collator(cfg)(items)
    finally:
        C._FC = fc

    def check(a, b, path):
        assert type(a) is type(b), path
        if isinstance(a, dict):
            assert sorted(a) == sorted(b), path
            for k in a:
                check(a[k], b[k], f"{path}.{k}")
        elif isinstance(a, np.ndarray):
            assert a.dtype == b.dtype and a.shape == b.shape, path
            assert (a == b).all(), path
        else:
            assert a == b, path

    for i, (na, pu) in enumerate(zip(native, pure)):
        check(na, pu, f"out[{i}]")


def test_native_unique_and_pad_match_python():
    from ruart_tpu.data import collate as C

    if C._FC is None:
        pytest.skip("native fastcollate unavailable")
    rng = np.random.RandomState(0)
    flat = rng.randint(0, 3, (64, 7)).astype(np.int32)
    un, inv = C.unique_rows(flat)
    fc = C._FC
    C._FC = None
    try:
        un2, inv2 = C.unique_rows(flat)
        rows = [list(rng.randint(0, 9, rng.randint(0, 11))) for _ in range(33)]
        pad2 = C._pad_ids(rows, 6)
    finally:
        C._FC = fc
    assert (un == un2).all() and (inv == inv2).all()
    assert (C._pad_ids(rows, 6) == pad2).all()


def test_native_fill_fuzz_parity():
    """Randomized ragged inputs through the native fill paths must match
    the numpy fallbacks element-for-element (empty rows, over-long rows,
    tuples vs lists, negative and cap-crossing offsets)."""
    from ruart_tpu.data import collate as C

    if C._FC is None:
        pytest.skip("native fastcollate unavailable")
    rng = np.random.RandomState(11)
    for trial in range(20):
        R = int(rng.randint(0, 40))
        L = int(rng.randint(1, 9))
        items = []
        for _ in range(R):
            n = int(rng.randint(0, 12))
            ids = [int(v) for v in rng.randint(0, 30000, n)]
            offs = [
                (int(rng.randint(-2, 12)), int(rng.randint(-2, 14)))
                for _ in range(int(rng.randint(0, 7)))
            ]
            items.append({
                "ids": tuple(ids) if rng.rand() < 0.3 else ids,
                "pos": [float(v) for v in rng.randn(8)],
                "off": offs,
            })
        # fill_ids vs python (_pad_ids fallback semantics)
        vals = np.zeros((R, L), np.int32)
        lens = np.zeros(R, np.int64)
        C._FC.fill_ids(items, "ids", vals, lens, L)
        fc = C._FC
        C._FC = None
        try:
            ref = C._pad_ids([list(it["ids"]) for it in items], L)
        finally:
            C._FC = fc
        assert (vals == ref).all()
        assert all(
            lens[i] == min(len(items[i]["ids"]), L) for i in range(R)
        )
        # fill_f32 vs fromiter float32 cast
        pos = np.zeros((R, 8), np.float32)
        C._FC.fill_f32(items, "pos", pos, 8)
        ref_pos = np.array([it["pos"] for it in items], np.float32).reshape(
            R, 8
        ) if R else pos
        assert (pos == ref_pos).all()
        # fill_offsets vs the numpy clip pipeline
        MW, MB = int(rng.randint(1, 8)), int(rng.randint(1, 10))
        off_c = np.zeros((R, MW, 2), np.int32)
        cnt = np.zeros(R, np.int64)
        C._FC.fill_offsets(items, "off", off_c, cnt, MW, MB)
        for i in range(R):
            offs = items[i]["off"][:MW]
            assert cnt[i] == len(offs)
            for j, (st, ed) in enumerate(offs):
                st2 = min(st, MB - 1)
                ed2 = max(min(ed, MB), st2)
                assert off_c[i, j, 0] == st2 and off_c[i, j, 1] == ed2
            assert (off_c[i, len(offs):] == 0).all()


def test_vocab_order_deterministic_across_processes(tmp_path, shipped_conf_opt):
    """Vocab order must not depend on the process hash seed: the
    non-answer chunk of _build_vocab iterates a set difference whose order
    is PYTHONHASHSEED-randomized, and the stable count sort preserves that
    arbitrary order among ties — caught by the 2-process training smoke
    (rank 0's checkpoint had permuted embedding rows vs the single-process
    oracle). Multi-host preprocessing and checkpoint portability require
    every process to build the identical vocab."""
    import json
    import subprocess
    import sys

    script = r"""
import json, sys
sys.path.insert(0, %r)
import msgpack
from ruart_tpu.core.config import Config
from ruart_tpu.data.preprocess import Preprocessor
root = %r
opt = json.load(open(root + "/opt.json"))
pre = Preprocessor(Config(opt))
with open(root + "/train.msgpack", "rb") as f:
    raw = msgpack.unpack(f, raw=False, strict_map_key=False)["data"]
data = pre._process_data(raw)
print(json.dumps(pre._build_vocab(data)))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
       str(tmp_path))

    raw = make_synthetic_raw_dataset(16, seed=7)
    with open(tmp_path / "train.msgpack", "wb") as f:
        msgpack.pack(raw, f)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train",
            "datadir": str(tmp_path),
            "FEATURE_FOLDER": str(tmp_path / "features"),
            "train_FILE": "train.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
        }
    )
    with open(tmp_path / "opt.json", "w") as f:
        json.dump({k: v for k, v in opt.items()}, f, default=str)

    vocabs = []
    for seed in ("1", "271828"):
        env = dict(os.environ)
        env["PYTHONHASHSEED"] = seed
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        vocabs.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    assert vocabs[0] == vocabs[1]
    assert len(vocabs[0]) > 10  # non-trivial vocab actually got built
