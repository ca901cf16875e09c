"""fixed_answers conf path: vocabulary head + alpha mixing + decode map."""

import os

import msgpack
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def test_fixed_answers_model_path(shipped_conf_opt, tmp_path):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update({"fixed_answers": True, "fixed_answers_len": 7})
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    assert spec.fixed_answers and spec.fixed_answers_len == 7

    q, ocr, od, gt = make_synthetic_batch(spec, cfg, 2, seed=0)
    model = RUArtModel(spec)
    q, ocr, od = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    scores = model.apply(params, q, ocr, od)
    # fixed_answers head emits fixed_len+1 softmaxed logits prepended
    # (`SDNet.py:432-436`, `Fixed_answers_predictor:598-606`)
    assert scores.shape == (2, (7 + 1) + cfg.max_ocr_num + 1)
    s = np.asarray(scores)
    assert not np.isnan(s).any()
    # alpha-mixed: fixed part sums to alpha, rest to 1-alpha
    alpha = float(np.asarray(params["params"]["fixed_ocr_alpha"]).reshape(()))
    np.testing.assert_allclose(s[:, : 7 + 1].sum(-1), alpha, rtol=1e-4)
    np.testing.assert_allclose(s[:, 7 + 1 :].sum(-1), 1 - alpha, rtol=1e-4)


def test_trainer_loads_fixed_answers(shipped_conf_opt, tmp_path):
    folder = tmp_path / "fixed"
    folder.mkdir()
    answers = ["red", "blue", "green"]
    (folder / "fixed_answers_4000.txt").write_text("\n".join(answers) + "\n")
    with open(folder / "TRAIN_VAL_fixed_answers_label.msgpack", "wb") as f:
        msgpack.pack({"labels": [0.0, 1.0, 0.0]}, f)

    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "fixed_answers": True,
            "fixed_answers_folder": str(folder),
            "datadir": str(tmp_path),
            "FEATURE_FOLDER": str(tmp_path),
        }
    )
    cfg = Config(opt)
    from ruart_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    assert trainer.fixed_answers == answers
    assert trainer.opt["fixed_answers_len"] == 3
    assert trainer.fixed_answers_entry["fixed_answers_label"]["labels"] == [
        0.0, 1.0, 0.0,
    ]
