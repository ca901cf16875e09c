import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from ruart_tpu.eval.coqa import (
    ensemble_predict,
    exact_match,
    f1_score,
    normalize_answer,
    score_predictions,
)
from ruart_tpu.models.fusion.conv import CharCNN, average_pooling, max_pooling
from ruart_tpu.train.schedules import bert_adam, warmup_linear
from ruart_tpu.utils.meters import AverageMeter
from ruart_tpu.utils.timing import Timers


def test_coqa_scoring():
    assert normalize_answer("The  Cat!") == "cat"
    assert f1_score("the cat sat", ["cat sat down"]) > 0.5
    assert exact_match("A dog", ["dog", "wolf"]) == 1.0
    res = score_predictions({"q1": "dog"}, {"q1": ["dog"], "q2": ["cat"]})
    assert res["em"] == 50.0


def test_coqa_f1_multi_answer_is_leave_one_out_not_max():
    # pred matches exactly one of three GTs: max-over-GT would give 1.0,
    # the reference's leave-one-out average (CoQAUtils.py:669-680) gives
    # mean(max(scores without i)) = (0 + 1 + 1) / 3.
    assert f1_score("alpha", ["alpha", "beta", "gamma"]) == pytest.approx(2 / 3)
    # single-GT path is plain F1 (no leave-one-out)
    assert f1_score("alpha", ["alpha"]) == 1.0
    # empty-GT edge cases (CoQAUtils.py:667-668)
    assert f1_score("", []) == 1.0
    assert f1_score("x", []) == 0.0
    assert f1_score(None, ["a"]) == 0.0


def test_coqa_ensemble_vote_semantics():
    # two models, two examples; model confidences weigh the vote
    # (CoQAUtils.ensemble_predict:638-651).
    preds = [["a", "x"], ["b", "x"]]
    scores = [[1.0, 0.5], [2.0, 0.25]]
    answers, best = ensemble_predict(preds, scores)
    assert answers == ["b", "x"]
    assert best == [2.0, 0.75]
    # vote_by_cnt: ties broken by earliest model (firstappear = -index)
    answers, _ = ensemble_predict([["a"], ["b"]], [[0.1], [9.9]], vote_by_cnt=True)
    assert answers == ["a"]


def test_pooling_matches_torch_semantics():
    torch.manual_seed(0)
    x = torch.randn(3, 5, 4)
    mask = torch.tensor(
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 1], [0, 0, 0, 0, 0]], dtype=torch.bool
    )
    # torch-reference max pooling semantics
    MIN = -1e6
    xm = x.masked_fill(~mask.unsqueeze(2), MIN)
    t_max = xm.max(1)[0]
    t_max = t_max.masked_fill(t_max == MIN, 0)
    j_max = max_pooling(jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(j_max), t_max.numpy(), atol=1e-6)

    xa = x.masked_fill(~mask.unsqueeze(2), 0)
    cnt = mask.float().sum(1, keepdim=True).clamp(min=1)
    t_avg = xa.sum(1) / cnt
    j_avg = average_pooling(jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(j_avg), t_avg.numpy(), atol=1e-6)


def test_char_cnn_shapes():
    model = CharCNN(window_size=3, output_size=8)
    x = jnp.ones((4, 10, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (4, 10, 8)
    assert (np.abs(np.asarray(out)) <= 1.0).all()  # tanh range


def test_warmup_linear_schedule():
    sched = warmup_linear(lr=1.0, warmup=0.1, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_bert_adam_steps():
    tx = bert_adam(lr=0.1, warmup=0.1, total_steps=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(new_params["w"])))


def test_meters_and_timers():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
    m2 = AverageMeter()
    m2.load_state_dict(m.state_dict())
    assert m2.avg == 3.0

    t = Timers()
    with t.timer("x"):
        pass
    assert "x:" in t.report()


def test_span_utilities():
    from ruart_tpu.eval.coqa import find_span, find_span_with_gt, gen_upper_triangle_mask

    m = gen_upper_triangle_mask(5, 3)
    assert m.shape == (5, 5)
    assert m[1, 1] and m[1, 3] and not m[1, 4] and not m[2, 0]

    ctx = "the red stop sign"
    offsets = [(0, 3), (4, 7), (8, 12), (13, 17)]
    assert find_span(offsets, 8, 12) == (2, 2)
    assert find_span_with_gt(ctx, offsets, "stop sign") == (2, 3)


def test_gc_tuning_opt_out_and_apply():
    import gc

    from ruart_tpu.utils.gctune import tune_gc

    saved = gc.get_threshold()
    try:
        assert tune_gc({"NO_GC_TUNE": True}) is False
        assert gc.get_threshold() == saved
        assert tune_gc({}) is True
        assert gc.get_threshold()[0] >= 100_000
    finally:
        gc.set_threshold(*saved)


def test_gram_word_keys_restriction(shipped_conf_opt, tmp_path):
    """Serving featurization restricts synthesized gram word-dicts to the
    keys the runtime dataset reads; offline (None) keeps the reference's
    full schema."""
    from ruart_tpu.core.config import Config
    from ruart_tpu.data.preprocess import Preprocessor
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset

    opt = dict(shipped_conf_opt)
    opt.update({
        "Task": "test", "datadir": str(tmp_path),
        "FEATURE_FOLDER": str(tmp_path),
        "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
        "preprocess_od_name": "OD_bottom-up",
    })
    p = Preprocessor(Config(opt))
    p.train_vocab = ["<PAD>", "<UNK>", "stop", "sign"]
    raw = make_synthetic_raw_dataset(3, seed=0, with_answers=False)["data"]

    data = p._process_data(raw)
    p._assign_ids(data)
    full = data[0]["ocr_PMTD_ASTER_gram2"][0]["word"]
    assert {"word", "wordid", "pos_id", "ent_id", "lemma"} <= set(full)

    p.gram_word_keys = ("word", "wordid", "pos_id", "ent_id")
    data = p._process_data(raw)
    p._assign_ids(data)
    slim = data[0]["ocr_PMTD_ASTER_gram2"][0]["word"]
    assert set(slim) == {"word", "wordid", "pos_id", "ent_id"}
    # restricted values equal the full-schema values
    for k in slim:
        assert slim[k] == full[k]
