import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.image_features import NpyImageFeatures, xyxy_to_quad8
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def test_xyxy_to_quad8():
    bbox = np.array([[0.1, 0.2, 0.5, 0.8]], dtype=np.float32)
    quad = xyxy_to_quad8(bbox)
    np.testing.assert_allclose(
        quad[0], [0.1, 0.2, 0.5, 0.2, 0.5, 0.8, 0.1, 0.8], atol=1e-6
    )


def test_npy_provider(tmp_path):
    feat = np.random.RandomState(0).rand(36, 64).astype(np.float32)
    info = {
        "bbox": np.array([[10, 20, 110, 220]] * 36, dtype=np.float32),
        "image_width": 200,
        "image_height": 400,
    }
    d = tmp_path / "train"
    d.mkdir()
    np.save(d / "img_0.npy", feat)
    np.save(d / "img_0_info.npy", info, allow_pickle=True)
    provider = NpyImageFeatures(str(tmp_path))
    f, s = provider.get("img_0.jpg", mode="train")
    assert f.shape == (36, 64) and s.shape == (36, 8)
    np.testing.assert_allclose(s[0, 0], 10 / 200, atol=1e-6)
    np.testing.assert_allclose(s[0, 5], 220 / 400, atol=1e-6)
    # cache hit returns identical object
    assert provider.get("img_0.jpg")[0] is f


def test_model_replace_od_path(shipped_conf_opt):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    opt.update({"img_feature": True, "img_fea_way": "replace_od",
                "img_fea_num": 6, "img_fea_dim": 32, "img_spa_dim": 8})
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    assert spec.img_feature and spec.img_fea_way == "replace_od"
    q, ocr, od, gt = make_synthetic_batch(spec, cfg, 2, seed=0)
    model = RUArtModel(spec)
    q, ocr, od = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    scores = model.apply(params, q, ocr, od)
    assert scores.shape == (2, cfg.max_ocr_num + 1)
    assert not np.isnan(np.asarray(scores)).any()
