"""End-to-end slice: synthetic raw data -> preprocess -> train a few steps
-> eval -> test inference writing submission.json (SURVEY §7 milestone 5/6)."""

import json
import os

import msgpack
import numpy as np
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.train.trainer import Trainer

from tests.test_fusion_model import TINY_OVERRIDES


@pytest.fixture(scope="module")
def trained(tmp_path_factory, shipped_conf_opt):
    root = tmp_path_factory.mktemp("e2e")
    for label, n, seed in (("train", 24, 0), ("val", 8, 1), ("test", 10, 2)):
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
            "batch_size": 4,
            "epoch": 2,  # 24*2/4 = 12 train batches
        }
    )
    cfg = Config(opt)
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=10, log_every=5)
    return trainer, cfg, root


def test_training_ran_and_loss_finite(trained):
    trainer, cfg, root = trained
    assert trainer.updates == 12
    assert np.isfinite(trainer.train_loss.avg)
    assert trainer.best_anls >= 0  # eval ran and produced a metric


def test_best_checkpoint_written(trained):
    trainer, cfg, root = trained
    assert trainer.save_folder is not None
    assert os.path.exists(os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"))
    assert os.path.exists(os.path.join(trainer.save_folder, "save_res_last.json"))


def test_predict_for_test_writes_submission(trained):
    trainer, cfg, root = trained
    opt = dict(cfg.opt)
    opt["RESUME"] = True
    opt["MODEL_PATH"] = os.path.relpath(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"), str(root)
    )
    cfg2 = Config(opt)
    t2 = Trainer(cfg2, bert_config=BertConfig.tiny(vocab_size=64))
    result = t2.predict_for_test()
    sub_path = os.path.join(t2.save_folder, "submission.json")
    assert os.path.exists(sub_path)
    with open(sub_path) as f:
        res = json.load(f)
    assert len(res) == 10  # pad tail trimmed to dataset size
    assert all("question_id" in r and "answer" in r for r in res)
    assert all(isinstance(r["answer"], str) and r["answer"] for r in res)


def test_debug_sdt_prints_per_step(trained, capsys):
    """`DEBUG_SDT` prints (loss, q_ids) every step (`SDNetTrainer.py:361-362`)."""
    trainer, cfg, root = trained
    opt = dict(cfg.opt)
    opt["RESUME"] = True
    opt["MODEL_PATH"] = os.path.relpath(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"), str(root)
    )
    opt["batch_st"] = 10  # 2 remaining batches
    opt["DEBUG_SDT"] = True
    cfg2 = Config(opt)
    t2 = Trainer(cfg2, bert_config=BertConfig.tiny(vocab_size=64))
    t2.train(eval_every=10 ** 6, log_every=10 ** 6)
    lines = [
        l for l in capsys.readouterr().out.splitlines() if "q_" in l or "[" in l
    ]
    assert len(lines) >= 2  # one print per remaining batch


def test_resume_from_checkpoint(trained):
    trainer, cfg, root = trained
    opt = dict(cfg.opt)
    opt["RESUME"] = True
    opt["MODEL_PATH"] = os.path.relpath(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt"), str(root)
    )
    opt["batch_st"] = 10  # resume near the end: 2 remaining batches
    cfg2 = Config(opt)
    t2 = Trainer(cfg2, bert_config=BertConfig.tiny(vocab_size=64))
    t2.train(eval_every=10 ** 6, log_every=10 ** 6)
    # update counter resumes from the checkpoint's count and advances by the
    # 2 remaining batches (reference semantics: `updates` is cumulative)
    import numpy as _np
    import json as _json

    with _np.load(
        os.path.join(trainer.save_folder, "ANLS_best_model.ckpt")
    ) as z:
        ckpt_updates = _json.loads(bytes(z["__meta__"].tobytes()).decode()).get(
            "updates", 0
        )
    assert t2.updates == ckpt_updates + 2
