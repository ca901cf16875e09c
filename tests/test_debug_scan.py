import json
import os

import msgpack
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.debug import dump_debug_scan, scan_dataset
from ruart_tpu.data.preprocess import Preprocessor
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab


def test_debug_scan(tmp_path, shipped_conf_opt):
    raw = make_synthetic_raw_dataset(12, seed=0)
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
    cfg = Config(opt)
    pre = Preprocessor(cfg)
    pre.ensure_preprocessed()
    with open(tmp_path / "features" / "train-preprocessed.msgpack", "rb") as f:
        data = msgpack.unpack(f, raw=False, strict_map_key=False)
    ds = VQADataset(
        data["data"], cfg, tokenizer=WordPieceTokenizer(build_demo_vocab())
    )
    hists = scan_dataset(ds)
    assert sum(hists["q"]["glove_len"].values()) == len(ds)
    assert sum(hists["q"]["ocr_num"].values()) == len(ds)
    paths = dump_debug_scan(ds, "train", str(tmp_path))
    assert all(os.path.exists(p) for p in paths)
    with open(paths[0]) as f:
        loaded = json.load(f)
    assert "glove_len" in loaded


def test_trainer_debug_mode(tmp_path, shipped_conf_opt):
    """'DEBUG' conf flag: trainer dry-runs the data path and dumps
    histograms without building batches for the model."""
    import glob as globmod

    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.train.trainer import Trainer

    for label, n in (("train", 8), ("val", 4)):
        raw = make_synthetic_raw_dataset(n, seed=1)
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
            "DEBUG": True,
            "batch_size": 4,
        }
    )
    cfg = Config(opt)
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train()
    assert trainer.updates == 0  # no training happened
    outs = globmod.glob(os.path.join(trainer.save_folder, "*_output.json"))
    assert len(outs) >= 6  # {train,val} x {q,ocr,od}
