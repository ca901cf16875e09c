"""Weight-only int8 BERT quantization (INT8_BERT conf flag, ops/quant.py).

No reference equivalent — a TPU serving feature for the frozen encoder
(`Bert.py:42-43` eval-mode-always, LOCK_BERT in the shipped conf)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.bert.model import BertModel
from ruart_tpu.ops.quant import (
    QUANT_LAYER_NAMES,
    QuantDense,
    quantize_bert_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.3
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    deq = q.astype(jnp.float32) * scale
    # symmetric 8-bit: error <= scale/2 per element, scale = amax/127
    bound = np.asarray(scale) / 2 + 1e-8
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= bound[None, :]).all()
    # zero column stays exactly zero (scale guard against 0/0)
    w0 = w.at[:, 3].set(0.0)
    q0, s0 = quantize_weight(w0)
    assert np.asarray(q0[:, 3]).max() == 0 and float(s0[3]) == 1.0


def test_quant_dense_matches_dequantized_dense():
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 24)) * 0.5
    b = jax.random.normal(jax.random.PRNGKey(2), (24,)) * 0.1
    q, scale = quantize_weight(w)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 16))

    mod = QuantDense(24)
    out = mod.apply(
        {"params": {"kernel_q": q, "scale": scale, "bias": b}}, x
    )
    ref = x @ (q.astype(jnp.float32) * scale) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_quantized_bert_forward_close_to_fp32():
    cfg = BertConfig.tiny(vocab_size=64)
    model = BertModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (3, 10), 1, 64)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(5), ids, mask)
    ref_layers, ref_pooled = model.apply(params, ids, mask)

    qcfg = dataclasses.replace(cfg, quant="int8")
    qmodel = BertModel(qcfg)
    qparams = quantize_bert_params(params)
    q_layers, q_pooled = qmodel.apply(qparams, ids, mask)

    # the quant tree has int8 kernels exactly at the six Dense names
    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    int8_paths = {
        tuple(getattr(p, "key", p) for p in path)
        for path, leaf in flat
        if leaf.dtype == jnp.int8
    }
    assert int8_paths, "no int8 leaves produced"
    for path in int8_paths:
        assert path[-1] == "kernel_q" and path[-2] in QUANT_LAYER_NAMES

    # per-layer drift stays small at tiny dims / unit-scale init
    np.testing.assert_allclose(
        np.asarray(q_pooled), np.asarray(ref_pooled), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(q_layers), np.asarray(ref_layers), atol=0.08
    )
    # ranking stability on the pooled features (decode operates on scores
    # derived from these representations)
    assert (
        np.asarray(q_pooled).argmax(-1) == np.asarray(ref_pooled).argmax(-1)
    ).all()


def test_int8_conf_flag_reaches_spec(shipped_conf_opt):
    from ruart_tpu.core.config import Config
    from ruart_tpu.core.presets import TINY_OVERRIDES
    from ruart_tpu.models.fusion.spec import ModelSpec

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt["INT8_BERT"] = True
    spec = ModelSpec.from_config(Config(opt), BertConfig.tiny(vocab_size=64))
    assert spec.bert.quant == "int8"
    spec2 = ModelSpec.from_config(
        Config({k: v for k, v in opt.items() if k != "INT8_BERT"}),
        BertConfig.tiny(vocab_size=64),
    )
    assert spec2.bert.quant == "none"


def test_int8_predict_for_test_end_to_end(tmp_path, shipped_conf_opt):
    """INT8_BERT conf flag drives the full predict path: fp32 checkpoint
    loads into the fp32 tree, then the eval program + params swap to the
    quantized encoder (Trainer._apply_int8_eval) and submission.json is
    written."""
    import json
    import os

    import msgpack

    from ruart_tpu.core.config import Config
    from ruart_tpu.core.presets import TINY_OVERRIDES
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.train.trainer import Trainer

    root = tmp_path
    for label, n, seed in (("train", 6, 0), ("val", 4, 1), ("test", 4, 2)):
        raw = make_synthetic_raw_dataset(n, seed=seed, with_answers=label != "test")
        with open(root / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        Task="train,val,test", train_FILE="train.msgpack",
        val_FILE="val.msgpack", test_FILE="test.msgpack",
        batch_size=2, epoch=1, datadir=str(root),
        FEATURE_FOLDER=str(root / "features"),
        preprocess_ocr_name="ocr_PMTD_ASTER,ES_ocr",
        preprocess_od_name="OD_bottom-up",
    )
    from ruart_tpu.models.bert.config import BertConfig as BC

    cfg = Config(opt)
    trainer = Trainer(cfg, bert_config=BC.tiny(vocab_size=64))
    trainer.train(eval_every=10 ** 6, log_every=10 ** 6)

    opt2 = dict(opt)
    opt2["RESUME"] = True
    opt2["INT8_BERT"] = True
    opt2["MODEL_PATH"] = os.path.relpath(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"), str(root)
    )
    t2 = Trainer(Config(opt2), bert_config=BC.tiny(vocab_size=64))
    t2.predict_for_test()
    assert t2._int8_eval
    sub_path = os.path.join(t2.save_folder, "submission.json")
    with open(sub_path) as f:
        res = json.load(f)
    assert len(res) == 4
    assert all(isinstance(r["answer"], str) and r["answer"] for r in res)
