"""Conf-flag sweep: every conf-gated architecture branch must build and
produce finite, correctly-shaped scores (the reference exposes these as
runtime flags; SURVEY §2 component table)."""

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


VARIANTS = {
    "prealign_after_rnn": {"PRE_ALIGN_befor_rnn": None, "PRE_ALIGN_after_rnn": True},
    "no_prealign": {"PRE_ALIGN": None, "PRE_ALIGN_befor_rnn": None},
    "no_context_self_attention": {"no_Context_Self_Attention": True},
    "no_deep_attention": {"no_DeepAttention": True},
    "position_cat": {"position_mod": "cat"},
    "merge_atted": {"pos_att_merge_mod": "atted"},
    "merge_original": {"pos_att_merge_mod": "original"},
    "no_es": {"useES": None, "ES_ocr": None, "ES_using_way": None},
    "multi2one_bidir": {"multi2one_bidir": True, "multi2one_hidden_size": 8},
    "in_rnn_layers_3": {"in_rnn_layers": 3},
    "concat_rnn": {"concat_rnn": True},
    "lable_one": {"lable_way": "lable_one"},
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_forward(shipped_conf_opt, name):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    for k, v in VARIANTS[name].items():
        if v is None:
            opt.pop(k, None)
        else:
            opt[k] = v
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, gt = make_synthetic_batch(spec, cfg, 2, seed=0)
    model = RUArtModel(spec)
    q, ocr, od = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    scores = model.apply(params, q, ocr, od)
    s = np.asarray(scores)
    assert s.shape == (2, cfg.dims.num_scores)
    assert not np.isnan(s).any()
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-4)
    # training gradient exists on every variant (through the real loss;
    # a plain scores.sum() would be constant — softmax rows sum to 1)
    from ruart_tpu.train.loss import instance_bce_with_logits

    tgt = jnp.asarray(gt)

    def loss(p):
        return instance_bce_with_logits(model.apply(p, q, ocr, od), tgt)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g["params"]["get_answer"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
