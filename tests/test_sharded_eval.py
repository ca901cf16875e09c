"""DP-sharded eval must reproduce single-device eval exactly."""

import numpy as np
import jax
import pytest

from ruart_tpu.data.collate import Collator
from ruart_tpu.eval.evaluator import evaluate
from ruart_tpu.eval.sharded import make_sharded_eval
from ruart_tpu.parallel.mesh import make_mesh
from ruart_tpu.train.loss import make_loss_fn
from ruart_tpu.train.train_step import make_eval_step


@pytest.mark.usefixtures("shipped_conf_opt")
def test_sharded_eval_matches_single(shipped_conf_opt, tmp_path_factory):
    import msgpack
    from ruart_tpu.core.config import Config
    from ruart_tpu.core.presets import TINY_OVERRIDES
    from ruart_tpu.data.dataset import VQADataset
    from ruart_tpu.data.preprocess import Preprocessor
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec
    from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

    root = tmp_path_factory.mktemp("sharded")
    raw = make_synthetic_raw_dataset(16, seed=3)
    with open(root / "train.msgpack", "wb") as f:
        msgpack.pack(raw, f)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train",
            "datadir": str(root),
            "FEATURE_FOLDER": str(root / "features"),
            "train_FILE": "train.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "batch_size": 8,
        }
    )
    cfg = Config(opt)
    pre = Preprocessor(cfg)
    pre.ensure_preprocessed()
    with open(root / "features" / "train-preprocessed.msgpack", "rb") as f:
        data = msgpack.unpack(f, raw=False, strict_map_key=False)
    tok = WordPieceTokenizer(build_demo_vocab())
    ds = VQADataset(data["data"], cfg, mode="dev", tokenizer=tok)

    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=len(tok.vocab)))
    model = RUArtModel(spec)
    from ruart_tpu.data.synthetic import make_synthetic_batch
    import jax.numpy as jnp

    q, ocr, od, _ = make_synthetic_batch(spec, cfg, 2, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        *(jax.tree.map(jnp.asarray, t) for t in (q, ocr, od)),
    )
    loss_fn = make_loss_fn("BCE_D1")
    coll = Collator(cfg)

    single = evaluate(make_eval_step(model, loss_fn), params, ds, cfg, coll)

    mesh = make_mesh(tp=2)
    with mesh:
        step, sharded_params, put = make_sharded_eval(model, loss_fn, params, mesh)
        sharded = evaluate(step, sharded_params, ds, cfg, coll, device_put=put)

    assert single["n"] == sharded["n"]
    np.testing.assert_allclose(single["ANLS"], sharded["ANLS"], atol=1e-5)
    np.testing.assert_allclose(single["ACC"], sharded["ACC"], atol=1e-5)
    assert [r["answer"] for r in single["res"]] == [
        r["answer"] for r in sharded["res"]
    ]
