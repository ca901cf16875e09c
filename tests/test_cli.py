"""CLI smoke test: conf file -> train -> predict, via the real entry points."""

import json
import os

import msgpack
import pytest

from ruart_tpu.core.presets import STVQA_CONF, TINY_OVERRIDES
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset


@pytest.fixture(scope="module")
def conf_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    for label, n, seed in (("train", 16, 0), ("val", 8, 1), ("test", 6, 2)):
        raw = make_synthetic_raw_dataset(n, seed=seed, with_answers=label != "test")
        with open(root / f"{label}.msgpack", "wb") as f:
            msgpack.pack(raw, f)
    lines = [STVQA_CONF]
    for k, v in TINY_OVERRIDES.items():
        lines.append(f"{k}\t{v}")
    lines += [
        "Task\ttrain,val,test",
        "train_FILE\ttrain.msgpack",
        "val_FILE\tval.msgpack",
        "test_FILE\ttest.msgpack",
        "preprocess_ocr_name\tocr_PMTD_ASTER,ES_ocr",
        "preprocess_od_name\tOD_bottom-up",
        "batch_size\t4",
    ]
    conf_path = root / "conf_test"
    # first-wins semantics: overrides must come BEFORE the preset keys
    override_text = "\n".join(lines[1:]) + "\nepoch\t1\n"
    conf_path.write_text(override_text + lines[0])
    (root / "features").mkdir()
    return root, str(conf_path)


def test_conf_overrides_win(conf_env):
    from ruart_tpu.cli.main import build_config

    root, conf_path = conf_env
    cfg = build_config(conf_path, overrides={"FEATURE_FOLDER": str(root / "features")})
    assert cfg.batch_size == 4
    assert cfg.max_ocr_num == TINY_OVERRIDES["max_ocr_num"]
    assert cfg.opt["datadir"] == str(root)


def test_cli_train_and_predict(conf_env, monkeypatch):
    root, conf_path = conf_env
    from ruart_tpu.cli.main import build_config
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.train.trainer import Trainer

    cfg = build_config(conf_path, overrides={"FEATURE_FOLDER": str(root / "features")})
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=10 ** 6, log_every=10 ** 6)
    ckpt = os.path.join(trainer.save_folder, "ANLS_best_model.ckpt")
    assert os.path.exists(ckpt)

    cfg2 = build_config(
        conf_path,
        overrides={
            "FEATURE_FOLDER": str(root / "features"),
            "RESUME": True,
            "MODEL_PATH": os.path.relpath(ckpt, str(root)),
        },
    )
    t2 = Trainer(cfg2, bert_config=BertConfig.tiny(vocab_size=64))
    t2.predict_for_test()
    sub = os.path.join(t2.save_folder, "submission.json")
    assert os.path.exists(sub)
    with open(sub) as f:
        res = json.load(f)
    assert len(res) == 6


def test_cli_serve_stdio(conf_env):
    """Serving CLI: conf + trained checkpoint -> JSON-lines in, answers
    out, in input order, via the real build_engine/serve_stdio path."""
    import io

    from ruart_tpu.cli.main import build_config
    from ruart_tpu.cli.serve_main import build_engine, serve_stdio
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.train.trainer import Trainer

    root, conf_path = conf_env
    cfg = build_config(conf_path, overrides={"FEATURE_FOLDER": str(root / "features")})
    trainer = Trainer(cfg, bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=10 ** 6, log_every=10 ** 6)
    ckpt = os.path.join(trainer.save_folder, "ANLS_best_model.ckpt")

    cfg2 = build_config(
        conf_path,
        overrides={
            "FEATURE_FOLDER": str(root / "features"),
            "RESUME": True,
            "MODEL_PATH": os.path.relpath(ckpt, str(root)),
        },
    )
    engine = build_engine(cfg2, bert_config=BertConfig.tiny(vocab_size=64))
    reqs = [
        {
            "question": f"what does sign {i} say",
            "image_width": 640, "image_height": 480,
            "ocr": [
                {"word": "stop", "pos": [10, 10, 60, 10, 60, 30, 10, 30]},
                {"word": f"w{i}", "pos": [99, 10, 150, 10, 150, 30, 99, 30]},
            ],
            "od": [{"object": "sign", "pos": [320, 240, 100, 60]}],
        }
        for i in range(5)
    ]
    inp = io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n")
    out = io.StringIO()
    n = serve_stdio(engine, inp, out, max_wait_ms=20.0)
    assert n == 5
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 5
    for r in lines:
        assert isinstance(r["answer"], str) and r["answer"]

    # a typo'd checkpoint path must fail loudly, not serve random weights
    cfg3 = build_config(
        conf_path,
        overrides={
            "FEATURE_FOLDER": str(root / "features"),
            "RESUME": True,
            "MODEL_PATH": "nope/missing.ckpt",
        },
    )
    with pytest.raises(FileNotFoundError):
        build_engine(cfg3, bert_config=BertConfig.tiny(vocab_size=64))
