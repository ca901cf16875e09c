"""Fused batched encoder pass (`bert_fuse 1`, default on).

The reference runs three separate encoder invocations per batch — question,
OCR candidates, OD candidates (`Models/SDNet.py:445-489`). On TPU that is
three small MXU batches and 36 layer-kernel launches; `RUArtModel._fused_bert`
concatenates same-token-width blocks into ONE encoder call (12 launches, one
big batch) and slices the rows back. Fusion must be EXACT: a single-segment
row in segment form (seg = attention mask, pos = arange) produces per-(query,
key) bias values identical to the dense attention-mask form, so every real
query position's output is unchanged (pad-query rows differ but are never
pooled). These tests pin forward and gradient equality vs `bert_fuse 0`
across the packed, dense, and compact layouts, and that fusion actually
reduces the number of encoder invocations.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.collate import Collator
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec


def _specs(opt, **overrides):
    """(fused spec, unfused spec, cfg) for one option dict."""
    base = dict(opt)
    base.update(TINY_OVERRIDES)
    base.update(overrides)
    cfg_on = Config({**base, "bert_fuse": 1})
    cfg_off = Config({**base, "bert_fuse": 0})
    bert = BertConfig.tiny(vocab_size=64)
    return (
        ModelSpec.from_config(cfg_on, bert),
        ModelSpec.from_config(cfg_off, bert),
        cfg_on,
    )


def _bert_call_count(model, params, jq, jocr, jod):
    _, state = model.apply(
        params, jq, jocr, jod,
        capture_intermediates=lambda mdl, _: mdl.name == "Bert",
        mutable=["intermediates"],
    )
    return len(state["intermediates"]["Bert"]["__call__"])


def _attach_pack(opt, item, pack_len=16):
    coll = Collator(
        Config({**opt, "bert_dedup_frac": 1.0, "bert_pack": 1,
                "bert_pack_len": pack_len})
    )
    B, N, Lb = item["bert"].shape
    out = {"bert": item["bert"], "bert_mask": item["bert_mask"]}
    coll._add_dedup(out, B, N, Lb)
    assert "bert_packed" in out
    it = dict(item)
    for k, v in out.items():
        if k not in ("bert", "bert_mask"):
            it[k] = v
    return it


def test_fuse_packed_tables_matches_unfused(shipped_conf_opt):
    """OCR + OD packed tables share the pack width, so they fuse into one
    encoder call; forward must equal the unfused three-call program."""
    spec_on, spec_off, cfg = _specs(shipped_conf_opt)
    q, ocr, od, _ = make_synthetic_batch(spec_on, cfg, 2, seed=0)
    for item in (ocr, od):
        for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
            item[k][:, 1:3] = item[k][:, 0:1]
        item["len"][:, 1:3] = item["len"][:, 0:1]
        item["bert_mask"] = (item["bert"] != 0).astype(np.int32)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    ocr_p = _attach_pack(opt, ocr)
    od_p = _attach_pack(opt, od)
    assert ocr_p["bert_packed"].shape[-1] == od_p["bert_packed"].shape[-1]

    jq, jocr, jod = (
        jax.tree.map(jnp.asarray, t) for t in (q, ocr_p, od_p)
    )
    model_on, model_off = RUArtModel(spec_on), RUArtModel(spec_off)
    params = model_off.init(jax.random.PRNGKey(0), jq, jocr, jod)
    off = np.asarray(model_off.apply(params, jq, jocr, jod))
    on = np.asarray(model_on.apply(params, jq, jocr, jod))
    np.testing.assert_allclose(on, off, atol=2e-5)

    n_off = _bert_call_count(model_off, params, jq, jocr, jod)
    n_on = _bert_call_count(model_on, params, jq, jocr, jod)
    assert n_on < n_off, (n_on, n_off)


def test_fuse_dense_all_widths_match(shipped_conf_opt):
    """With q / OCR / OD dense rows forced to one token width all three
    blocks fuse into a single encoder call — still exact."""
    spec_on, spec_off, cfg = _specs(shipped_conf_opt)
    q, ocr, od, _ = make_synthetic_batch(
        spec_on, cfg, 2, seed=1,
        q_bert_len=12, ocr_bert_len=12,
    )
    ok = (
        q["bert"].shape[-1] == ocr["bert"].shape[-1] == od["bert"].shape[-1]
    )
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    model_on, model_off = RUArtModel(spec_on), RUArtModel(spec_off)
    params = model_off.init(jax.random.PRNGKey(1), jq, jocr, jod)
    off = np.asarray(model_off.apply(params, jq, jocr, jod))
    on = np.asarray(model_on.apply(params, jq, jocr, jod))
    np.testing.assert_allclose(on, off, atol=2e-5)
    if ok:
        assert _bert_call_count(model_on, params, jq, jocr, jod) == 1


def test_fuse_skips_dense_compact_rows(shipped_conf_opt):
    """A dense candidate block with `cand_sel` attached is compact-gathered
    inside _encode_candidates; fusion must skip it (rows would mismatch)
    and the forward must still equal the unfused program."""
    spec_on, spec_off, cfg = _specs(shipped_conf_opt)
    q, ocr, od, _ = make_synthetic_batch(spec_on, cfg, 2, seed=2)
    coll = Collator(Config({**dict(shipped_conf_opt), **TINY_OVERRIDES,
                            "cand_compact": 1}))
    B, N = ocr["num"].shape[0], ocr["bert"].shape[1]
    out = dict(ocr)
    coll._add_compact(out, B, N)
    assert "cand_sel" in out
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, out, od))
    model_on, model_off = RUArtModel(spec_on), RUArtModel(spec_off)
    params = model_off.init(jax.random.PRNGKey(2), jq, jocr, jod)
    off = np.asarray(model_off.apply(params, jq, jocr, jod))
    on = np.asarray(model_on.apply(params, jq, jocr, jod))
    np.testing.assert_allclose(on, off, atol=2e-5)


def test_fuse_gradients_match(shipped_conf_opt):
    """Backward through the fused encoder equals the unfused gradients
    (slice-of-concat differentiates exactly)."""
    spec_on, spec_off, cfg = _specs(shipped_conf_opt)
    q, ocr, od, _ = make_synthetic_batch(spec_on, cfg, 2, seed=3)
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    ocr_p = _attach_pack(opt, ocr)
    jq, jocr, jod = (jax.tree.map(jnp.asarray, t) for t in (q, ocr_p, od))
    model_on, model_off = RUArtModel(spec_on), RUArtModel(spec_off)
    params = model_off.init(jax.random.PRNGKey(3), jq, jocr, jod)

    def loss(model):
        def f(p):
            scores = model.apply(p, jq, jocr, jod, deterministic=True)
            return jnp.sum(jax.nn.log_softmax(scores) ** 2)
        return f

    g_off = jax.grad(loss(model_off))(params)
    g_on = jax.grad(loss(model_on))(params)
    flat_off, _ = jax.flatten_util.ravel_pytree(g_off)
    flat_on, _ = jax.flatten_util.ravel_pytree(g_on)
    np.testing.assert_allclose(
        np.asarray(flat_on), np.asarray(flat_off), atol=5e-5
    )
