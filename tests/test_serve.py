import numpy as np
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec
from ruart_tpu.serve import InferenceEngine
from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

from ruart_tpu.core.presets import TINY_OVERRIDES


def _requests(n):
    reqs = []
    for i in range(n):
        reqs.append(
            {
                "question": f"what does the sign {i} say",
                "image_width": 640,
                "image_height": 480,
                "ocr": [
                    {"word": "stop", "pos": [10, 10, 60, 10, 60, 30, 10, 30]},
                    {"word": "exit", "pos": [100, 10, 150, 10, 150, 30, 100, 30]},
                ],
                "od": [{"object": "sign", "pos": [320, 240, 100, 60]}],
            }
        )
    return reqs


def test_inference_engine(shipped_conf_opt):
    import jax
    import jax.numpy as jnp

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "batch_size": 2,
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "datadir": ".",
            "FEATURE_FOLDER": ".",
        }
    )
    cfg = Config(opt)
    tok = WordPieceTokenizer(build_demo_vocab())
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=len(tok.vocab)))

    # vocab: reserved + the words used in requests
    vocab = ["<PAD>", "<UNK>", "<Q>", "<OCR>", "<OD>", "stop", "exit", "sign",
             "what", "does", "the", "say"]
    # pad vocab to spec.vocab_size rows
    while len(vocab) < spec.vocab_size:
        vocab.append(f"w{len(vocab)}")

    from ruart_tpu.data.synthetic import make_synthetic_batch

    model = RUArtModel(spec)
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        *(jax.tree.map(jnp.asarray, t) for t in (q, ocr, od)),
    )

    engine = InferenceEngine(cfg, spec, params, vocab, tok)
    # 3 requests with batch_size 2 -> exercises tail padding
    results = engine.predict(_requests(3))
    assert len(results) == 3
    for r in results:
        assert isinstance(r["answer"], str) and r["answer"]
        assert np.isfinite(r["score"])
    # same request -> same answer (deterministic)
    again = engine.predict(_requests(3))
    assert [r["answer"] for r in again] == [r["answer"] for r in results]


def _tiny_engine(shipped_conf_opt, extra=None):
    import jax
    import jax.numpy as jnp

    from ruart_tpu.data.synthetic import make_synthetic_batch

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "batch_size": 2,
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "datadir": ".",
            "FEATURE_FOLDER": ".",
        }
    )
    if extra:
        opt.update(extra)
    cfg = Config(opt)
    tok = WordPieceTokenizer(build_demo_vocab())
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=len(tok.vocab)))
    vocab = ["<PAD>", "<UNK>", "<Q>", "<OCR>", "<OD>", "stop", "exit", "sign"]
    while len(vocab) < spec.vocab_size:
        vocab.append(f"w{len(vocab)}")
    model = RUArtModel(spec)
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        *(jax.tree.map(jnp.asarray, t) for t in (q, ocr, od)),
    )
    return InferenceEngine(cfg, spec, params, vocab, tok)


def test_engine_quantize(shipped_conf_opt):
    engine = _tiny_engine(shipped_conf_opt)
    base = engine.predict(_requests(2))
    engine.quantize()
    assert engine.spec.bert.quant == "int8"
    quant = engine.predict(_requests(2))
    assert len(quant) == 2
    for r in quant:
        assert isinstance(r["answer"], str) and r["answer"]
        assert np.isfinite(r["score"])
    # idempotent
    engine.quantize()


def test_engine_warmup_precompiles_all_signatures(shipped_conf_opt):
    """warmup() must run one eval per (length bucket x dedup bucket incl.
    dense) signature without error; subsequent predicts hit those shapes."""
    engine = _tiny_engine(shipped_conf_opt, extra={"bucket_ocr_num": 2})
    n = engine.warmup()
    ladders = len(engine.collator.ocr_num_buckets) * len(
        engine.collator.ocr_len_buckets
    )
    assert n >= ladders  # at least the dense program per shape combo
    res = engine.predict(_requests(2))
    assert len(res) == 2


def test_engine_warmup_max_programs(shipped_conf_opt):
    """max_programs truncates the warmup cross product (later signatures
    compile lazily); the engine still serves correctly afterwards."""
    engine = _tiny_engine(shipped_conf_opt)
    n = engine.warmup(max_programs=1)
    assert n == 1
    res = engine.predict(_requests(2))
    assert len(res) == 2


def test_batching_server(shipped_conf_opt):
    """Dynamic micro-batcher: per-request submits resolve to the same
    answers as a direct batched predict; works as a context manager and
    rejects submits after close."""
    from ruart_tpu.serve import BatchingServer

    engine = _tiny_engine(shipped_conf_opt)
    reqs = _requests(3)
    direct = engine.predict(reqs)
    with BatchingServer(engine, max_wait_ms=20.0) as server:
        futs = [server.submit(r) for r in reqs]
        got = [f.result(timeout=120) for f in futs]
        stats = server.stats()
    assert [g["answer"] for g in got] == [d["answer"] for d in direct]
    assert stats["requests"] == 3
    assert stats["latency_p99_ms"] >= stats["latency_p50_ms"] > 0
    assert 0 < stats["mean_batch_fill"] <= 1
    with pytest.raises(RuntimeError):
        server.submit(reqs[0])


def test_batching_server_propagates_errors(shipped_conf_opt):
    from ruart_tpu.serve import BatchingServer

    engine = _tiny_engine(shipped_conf_opt)

    def boom(samples):
        raise ValueError("planted failure")

    engine.prepare = boom  # host stage of the two-stage pipeline
    with BatchingServer(engine, max_wait_ms=5.0) as server:
        fut = server.submit(_requests(1)[0])
        with pytest.raises(ValueError, match="planted failure"):
            fut.result(timeout=60)


def test_engine_warmup_calibrated(shipped_conf_opt):
    """warmup_calibrated precompiles the signatures a traffic sample
    produces (plus dense fallbacks) — dedup'd, so replaying the same
    sample adds nothing, and a subsequent predict on that traffic reuses
    the compiled programs."""
    engine = _tiny_engine(shipped_conf_opt)
    sample = _requests(4)
    n = engine.warmup_calibrated(sample)
    # >= 1 observed signature + the all-caps dense panic program
    assert n >= 2
    res = engine.predict(sample)
    assert len(res) == 4
    for r in res:
        assert isinstance(r["answer"], str) and r["answer"]


def test_engine_worker_pool_items_match_serial(shipped_conf_opt):
    """num_worker > 0 builds the host batch in a fork pool; the collated
    arrays must be byte-identical to the serial path (and answers equal)."""
    serial = _tiny_engine(shipped_conf_opt)
    pooled = _tiny_engine(shipped_conf_opt, extra={"num_worker": 2})
    reqs = _requests(3)  # varied questions, 2 batches incl. tail pad
    try:
        got_s = list(serial._collated_batches(reqs))
        got_p = list(pooled._collated_batches(reqs))
        assert len(got_s) == len(got_p) == 2
        for (st_s, n_s, b_s), (st_p, n_p, b_p) in zip(got_s, got_p):
            assert (st_s, n_s) == (st_p, n_p)
            # (q, ocr, od, gt, extra): arrays byte-equal, extra dict equal
            for blk_s, blk_p in zip(b_s[:3], b_p[:3]):
                assert set(blk_s) == set(blk_p)
                for k in blk_s:
                    np.testing.assert_array_equal(
                        np.asarray(blk_s[k]), np.asarray(blk_p[k]), err_msg=k
                    )
        answers_s = serial.predict(reqs)
        answers_p = pooled.predict(reqs)
        assert [r["answer"] for r in answers_p] == [
            r["answer"] for r in answers_s
        ]
    finally:
        pooled.close()
