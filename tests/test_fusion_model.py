import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruart_tpu.core.config import Config
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel, install_embeddings
from ruart_tpu.models.fusion.spec import ModelSpec


from ruart_tpu.core.presets import TINY_OVERRIDES


_CACHE = {}


def tiny_setup(shipped_conf_opt, extra=None, batch=2, seed=0):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    if extra:
        opt.update(extra)
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    q, ocr, od, gt = make_synthetic_batch(spec, cfg, batch, seed=seed)
    return cfg, spec, (q, ocr, od, gt)


def tiny_model_and_params(shipped_conf_opt, extra=None, batch=2, seed=0):
    """Memoized (cfg, spec, batch, model, params): model init is the slow
    part of these tests, share it across cases with identical specs."""
    key = (tuple(sorted((extra or {}).items())), batch, seed)
    if key not in _CACHE:
        cfg, spec, (q, ocr, od, gt) = tiny_setup(shipped_conf_opt, extra, batch, seed)
        model = RUArtModel(spec)
        jq, jocr, jod = to_jnp(q), to_jnp(ocr), to_jnp(od)
        params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
        _CACHE[key] = (cfg, spec, (jq, jocr, jod, gt), model, params)
    return _CACHE[key]


def to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


def test_forward_shapes_and_probs(shipped_conf_opt):
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(shipped_conf_opt)
    scores = model.apply(params, q, ocr, od)
    # 12 ocr + 1 no-answer
    assert scores.shape == (2, cfg.max_ocr_num + 1)
    s = np.asarray(scores)
    assert not np.isnan(s).any()
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-4)


def test_forward_jit_and_determinism(shipped_conf_opt):
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(shipped_conf_opt)

    fwd = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
    s1 = fwd(params, q, ocr, od)
    s2 = fwd(params, q, ocr, od)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    # training mode differs (dropout active) but stays finite
    st = model.apply(
        params, q, ocr, od, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(7)},
    )
    assert not np.isnan(np.asarray(st)).any()
    assert not np.allclose(np.asarray(st), np.asarray(s1))


def test_padding_candidate_invariance(shipped_conf_opt):
    """Values in candidate slots beyond `num` must not affect the scores of
    valid candidates (the reference zero-fills those slots)."""
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(shipped_conf_opt)
    base = np.asarray(model.apply(params, q, ocr, od))

    # corrupt everything beyond num in the ocr block
    num = int(np.asarray(ocr["num"])[0])
    ocr2 = dict(ocr)
    for k in ("fasttext", "glove", "pos", "ent"):
        arr = np.asarray(ocr2[k]).copy()
        arr[0, num:, :] = 7
        ocr2[k] = jnp.asarray(arr)
    arr = np.asarray(ocr2["len"]).copy()
    arr[0, num:] = 3
    ocr2["len"] = jnp.asarray(arr)
    out = np.asarray(model.apply(params, q, ocr2, od))
    np.testing.assert_allclose(out[0, :num], base[0, :num], atol=2e-5)


def test_install_embeddings(shipped_conf_opt):
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(shipped_conf_opt)
    V = spec.vocab_size
    glove = np.zeros((V, spec.glove_dim), dtype=np.float32)
    fast = np.ones((V, spec.fast_dim), dtype=np.float32)
    params2 = install_embeddings(params, glove=glove, fasttext=fast)
    assert np.asarray(params2["params"]["glove_embed"]["embedding"]).sum() == 0
    assert np.asarray(params2["params"]["fast_embed"]["embedding"]).sum() == V * spec.fast_dim
    # still runs
    scores = model.apply(params2, q, ocr, od)
    assert not np.isnan(np.asarray(scores)).any()


def test_yesno_and_fixed_answers_paths(shipped_conf_opt):
    cfg, spec, batch = tiny_setup(
        shipped_conf_opt, extra={"label_yesno": True}
    )
    assert spec.label_yesno
    q, ocr, od, gt = batch
    model = RUArtModel(spec)
    q, ocr, od = to_jnp(q), to_jnp(ocr), to_jnp(od)
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    scores = model.apply(params, q, ocr, od)
    assert scores.shape == (2, 3 + cfg.max_ocr_num + 1)


def test_es_post_process_path(shipped_conf_opt):
    cfg, spec, batch = tiny_setup(
        shipped_conf_opt, extra={"ES_using_way": "post_process"}
    )
    q, ocr, od, gt = batch
    model = RUArtModel(spec)
    q, ocr, od = to_jnp(q), to_jnp(ocr), to_jnp(od)
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    scores = model.apply(params, q, ocr, od)
    assert scores.shape == (2, cfg.max_ocr_num + 1)
    assert not np.isnan(np.asarray(scores)).any()


def test_attention_map_extraction(shipped_conf_opt):
    """att_score-equivalent: every Attention module's alpha is recoverable
    via forward_with_attention (reference SDNet.py:253-258 surface)."""
    from ruart_tpu.models.fusion.introspect import forward_with_attention

    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(shipped_conf_opt)
    scores, alphas = forward_with_attention(model, params, q, ocr, od)
    assert scores.shape[0] == 2
    assert alphas, "no attention maps captured"
    # at least prealign + 3 deep-attention levels + self/qk attentions
    assert len(alphas) >= 6
    for path, a in alphas.items():
        arr = np.asarray(a)
        assert arr.ndim == 3, (path, arr.shape)
        np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-4)


def test_bert_chunking_wired_into_model(shipped_conf_opt):
    """Conf-driven >512 chunking (`Bert.py:94-101`): when a conf's bert
    lengths exceed max_position_embeddings, RUArtModel._bert_words encodes
    fixed chunks with restarted positions and concatenates before pooling.

    Invariance check: with the q piece ids duplicated across the two chunks,
    pooling a word from chunk 1 and pooling the mirrored span in chunk 2
    must give identical scores — true only if positions restart per chunk.
    """
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    cfg = Config(opt)
    # max_q_bert_len=12 / max_ocr_bert_len=10 / max_od_bert_len=8 all exceed
    # max_position_embeddings=6 -> every BERT call runs the chunked path
    spec = ModelSpec.from_config(
        cfg, BertConfig.tiny(vocab_size=64, max_position_embeddings=6)
    )
    q, ocr, od, gt = make_synthetic_batch(spec, cfg, 2, seed=3)
    half = 6
    q["bert"][:, :half] = np.maximum(q["bert"][:, :half], 1)  # no pad bits
    q["bert"][:, half:] = q["bert"][:, :half]
    q["bert_mask"] = (q["bert"] != 0).astype(np.int32)
    q["bert_offsets"][:] = np.clip(q["bert_offsets"], 0, half - 1)

    model = RUArtModel(spec)
    jq, jocr, jod = to_jnp(q), to_jnp(ocr), to_jnp(od)
    params = model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    s1 = np.asarray(model.apply(params, jq, jocr, jod))
    assert not np.isnan(s1).any()

    q2 = dict(q)
    q2["bert_offsets"] = q["bert_offsets"] + half  # mirrored chunk-2 spans
    s2 = np.asarray(model.apply(params, to_jnp(q2), jocr, jod))
    np.testing.assert_allclose(s1, s2, atol=1e-5)
