"""Trainer auto-mesh path: with 8 virtual devices and a divisible batch the
trainer shards params/batches and trains SPMD."""

import msgpack
import numpy as np
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.train.trainer import Trainer


def test_trainer_uses_mesh(tmp_path, shipped_conf_opt):
    for label, n, seed in (("train", 16, 0), ("val", 8, 1)):
        raw = make_synthetic_raw_dataset(n, seed=seed)
        with open(tmp_path / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train,val",
            "datadir": str(tmp_path),
            "FEATURE_FOLDER": str(tmp_path / "features"),
            "train_FILE": "train.msgpack",
            "val_FILE": "val.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "batch_size": 8,
            "epoch": 1,
        }
    )
    cfg = Config(opt)
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=10 ** 6, log_every=10 ** 6)
    assert trainer.mesh is not None
    assert trainer.mesh.shape["dp"] * trainer.mesh.shape["tp"] == 8
    assert trainer.updates == 2
    assert np.isfinite(trainer.train_loss.avg)
    # params carry mesh shardings
    kernel = trainer.state.params["params"]["Bert"]["layer_0"][
        "attention_self"
    ]["query"]["kernel"]
    assert "tp" in str(kernel.sharding.spec)


def test_tp_mesh_forces_xla_attention(tmp_path, shipped_conf_opt):
    """With tp>1 in the auto-mesh, 'auto' attention must resolve to the
    GSPMD-shardable einsum path (the Pallas custom call would be
    replicated behind all-gathers on the head-sharded QKV)."""
    for label, n, seed in (("train", 16, 0), ("val", 8, 1)):
        raw = make_synthetic_raw_dataset(n, seed=seed)
        with open(tmp_path / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train,val",
            "datadir": str(tmp_path),
            "FEATURE_FOLDER": str(tmp_path / "features"),
            "train_FILE": "train.msgpack",
            "val_FILE": "val.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "batch_size": 8,
            "epoch": 1,
        }
    )
    trainer = Trainer(
        Config(opt), bert_config=BertConfig.tiny(vocab_size=64)
    )
    trainer.preproc.ensure_preprocessed()
    _, _, embeddings = trainer.preproc.load_data()
    trainer.setup_model(embeddings)
    assert trainer.mesh is not None
    if trainer.mesh.shape["tp"] > 1:
        assert trainer.spec.bert.attention_impl == "xla"
