import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ruart_tpu.train import checkpoint as ckpt
from ruart_tpu.train.loss import cross_entropy, instance_bce_with_logits, make_loss_fn
from ruart_tpu.eval.decoder import decode_answer


def test_bce_d1_matches_torch():
    torch.manual_seed(0)
    logits = torch.randn(4, 7)
    labels = torch.rand(4, 7)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(logits, labels)
    ours = instance_bce_with_logits(
        jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), scale_d1=False
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # D1 scaling multiplies by label width
    d1 = instance_bce_with_logits(
        jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), scale_d1=True
    )
    np.testing.assert_allclose(float(d1), float(ref) * 7, rtol=1e-5)


def test_ce_matches_torch():
    torch.manual_seed(1)
    logits = torch.randn(5, 9)
    labels = torch.zeros(5, 9)
    idx = torch.randint(0, 9, (5,))
    labels[torch.arange(5), idx] = 1.0
    ref = torch.nn.functional.cross_entropy(logits, idx)
    ours = cross_entropy(jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_decoder_basic_and_sentinel_skip():
    # 5 candidates (sentinel at index 4) + 1 no-answer slot
    ocr_list = ["alpha", "beta", "gamma", "delta", "<OCR>"]
    prob = np.array([0.1, 0.05, 0.3, 0.02, 0.9, 0.0])
    out = decode_answer(prob, ocr_list, num_cnt=5, label_no_answer=True)
    # top score is the sentinel (idx 4) -> skipped -> next is gamma
    assert out["answer"] == "gamma"

    # no-answer wins -> 'unanswerable'
    prob2 = np.array([0.1, 0.05, 0.3, 0.02, 0.2, 0.95])
    out2 = decode_answer(prob2, ocr_list, num_cnt=5, label_no_answer=True)
    assert out2["answer"] == "unanswerable"

    # candidate beyond num_cnt is not selectable
    prob3 = np.array([0.1, 0.0, 0.0, 0.9, 0.0, 0.0])
    out3 = decode_answer(prob3, ocr_list[:3], num_cnt=3, label_no_answer=True)
    assert out3["answer"] in ("alpha", "beta", "gamma")


def test_decoder_yesno_fixed_mapping():
    fixed = ["red", "blue"]
    ocr_list = ["x", "<OCR>"]
    # layout: [f0 f1 | noread yes no | c0 c1 | noanswer]
    C = 2 + 3 + 2 + 1
    prob = np.zeros(C)
    prob[1] = 1.0
    assert (
        decode_answer(prob, ocr_list, 2, fixed, yesno=True, label_no_answer=True)[
            "answer"
        ]
        == "blue"
    )
    prob = np.zeros(C)
    prob[3] = 1.0
    assert (
        decode_answer(prob, ocr_list, 2, fixed, yesno=True, label_no_answer=True)[
            "answer"
        ]
        == "yes"
    )
    prob = np.zeros(C)
    prob[5] = 1.0
    assert (
        decode_answer(prob, ocr_list, 2, fixed, yesno=True, label_no_answer=True)[
            "answer"
        ]
        == "x"
    )


def test_checkpoint_roundtrip_and_intersection(tmp_path):
    params = {
        "params": {
            "a": {"kernel": np.ones((3, 2), np.float32)},
            "b": {"bias": np.zeros((4,), np.float32)},
        }
    }
    path = str(tmp_path / "model.ckpt")
    ckpt.save_checkpoint(path, params, opt_leaves=[np.arange(3.0)], meta={"updates": 7})

    init = {
        "params": {
            "a": {"kernel": np.zeros((3, 2), np.float32)},
            "b": {"bias": np.ones((4,), np.float32)},
            "c": {"w": np.full((2,), 5.0, np.float32)},  # missing in ckpt
        }
    }
    loaded, opt_leaves, meta = ckpt.load_checkpoint(path, init)
    assert meta["updates"] == 7
    np.testing.assert_array_equal(loaded["params"]["a"]["kernel"], 1.0)
    np.testing.assert_array_equal(loaded["params"]["b"]["bias"], 0.0)
    # missing keys keep init values (key-intersection contract)
    np.testing.assert_array_equal(loaded["params"]["c"]["w"], 5.0)
    assert len(opt_leaves) == 1


def test_restore_opt_state_strict_and_lenient():
    import optax

    params = {"w": np.ones((3,), np.float32)}
    tx = optax.adamax(1e-3)
    template = tx.init(params)
    good = [np.asarray(l) for l in ckpt.opt_state_leaves(template)]

    # faithful restore round-trips
    restored = ckpt.restore_opt_state(template, good)
    for a, b in zip(ckpt.opt_state_leaves(restored), good):
        np.testing.assert_array_equal(np.asarray(a), b)

    # None = predict checkpoint (no opt state stored) -> fresh template, no error
    assert ckpt.restore_opt_state(template, None) is template

    # structural mismatch: strict (default) raises, lenient reinitializes
    bad = good[:-1]
    with pytest.raises(ValueError, match="LENIENT_OPT_RESUME"):
        ckpt.restore_opt_state(template, bad)
    assert ckpt.restore_opt_state(template, bad, strict=False) is template

    bad_shape = list(good)
    bad_shape[-1] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError):
        ckpt.restore_opt_state(template, bad_shape)
    assert (
        ckpt.restore_opt_state(template, bad_shape, strict=False) is template
    )


def test_save_for_predict_drops_bert(tmp_path):
    params = {
        "params": {
            "Bert": {"layer_0": {"k": np.ones((2, 2), np.float32)}},
            "head": {"w": np.ones((2,), np.float32)},
        }
    }
    path = str(tmp_path / "predict.ckpt")
    ckpt.save_for_predict(path, params)
    loaded, _, _ = ckpt.load_checkpoint(path, params)
    # Bert keys keep init (they were dropped from the file)
    flat = ckpt.flatten_tree(loaded)
    assert "params/head/w" in flat


def _tiny_train_step(debug_nans: bool):
    from ruart_tpu.core.presets import tiny_config
    from ruart_tpu.data.synthetic import make_synthetic_batch
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec
    from ruart_tpu.train.loss import make_loss_fn
    from ruart_tpu.train.optim import make_optimizer, make_row_pinner
    from ruart_tpu.train.train_step import init_train_state, make_train_step

    cfg = tiny_config(batch_size=2)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    model = RUArtModel(spec)
    q, ocr, od, targets = make_synthetic_batch(spec, cfg, 2, seed=0)
    q, ocr, od = (jax.tree.map(jnp.asarray, t) for t in (q, ocr, od))
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    tx = make_optimizer("#", 1e-3, 10.0, params, spec, tune_partial=True)
    row_pinner = make_row_pinner(params, spec, tune_partial_rows=8)
    step = make_train_step(
        model, tx, make_loss_fn("BCE_D1"), row_pinner,
        donate=False, debug_nans=debug_nans,
    )
    state = init_train_state(params, tx, seed=0)
    return step, state, (q, ocr, od, jnp.asarray(targets))


def test_debug_nans_clean_step_passes():
    """DEBUG_NANS instrumentation must not fire on a healthy batch (the
    reference's sentinels are silent in normal training,
    SDNetTrainer.py:339-359)."""
    step, state, (q, ocr, od, tgt) = _tiny_train_step(debug_nans=True)
    new_state, loss = step(state, q, ocr, od, tgt)
    assert np.isfinite(float(loss))


def test_debug_nans_catches_planted_nan():
    """A NaN planted in the float inputs must raise with a checkify error,
    mirroring the reference's in-graph asserts (Layers.py:169,290;
    SDNetTrainer.py:224-226,348-351)."""
    step, state, (q, ocr, od, tgt) = _tiny_train_step(debug_nans=True)

    bad_tgt = tgt.at[0, 0].set(jnp.nan)
    with pytest.raises(Exception, match="(?i)nan"):
        step(state, q, ocr, od, bad_tgt)

    bad_ocr = dict(ocr)
    bad_ocr["position"] = ocr["position"].at[0, 0, 0].set(jnp.nan)
    with pytest.raises(Exception, match="(?i)nan"):
        step(state, q, bad_ocr, od, tgt)
