"""Evaluator aggregation semantics (`SDNetTrainer.evaluate:128-176`):
metrics normalize by dataset size while the wrap-around sampler re-feeds
head samples to fill the last batch; test mode trims those rows."""

import numpy as np

from ruart_tpu.eval.evaluator import trim_pad_tail
from ruart_tpu.eval.decoder import decode_batch


def test_trim_pad_tail():
    res = list(range(10))  # ceil(7/4)*4 = 8? -> n=7, batch=4 -> 8 rows
    assert trim_pad_tail(list(range(8)), n=7, batch_size=4) == list(range(7))
    # exact multiple: nothing trimmed
    assert trim_pad_tail(list(range(8)), n=8, batch_size=4) == list(range(8))


def test_decode_batch_metrics_application():
    """ANLS >= 0.5 zeroing and the ACC x10/3 cap are applied per sample."""
    ocr_list = ["stop", "exit", "<OCR>"]
    extra = [
        {"q_id": 1, "answers": ["stop"] * 10, "ocr_list": ocr_list},
        {"q_id": 2, "answers": ["stup"], "ocr_list": ocr_list},  # ANLS 0.75
        {"q_id": 3, "answers": ["zzzzz"], "ocr_list": ocr_list},  # ANLS 0.0
    ]
    probs = np.zeros((3, 4), dtype=np.float32)
    probs[:, 0] = 1.0  # everyone answers 'stop'
    res, save_res, anls, acc = decode_batch(
        probs, extra, num_cnt=np.array([3, 3, 3]), label_no_answer=True
    )
    assert [r["answer"] for r in res] == ["stop"] * 3
    # q1: exact (1.0) + q2: 0.75 + q3: 0 (below 0.5 -> zeroed)
    np.testing.assert_allclose(anls, 1.0 + 0.75 + 0.0, atol=1e-6)
    # q1: 10 matching answers -> min(10*(10/10)/3, 1) = 1; q2/q3: 0 matches
    np.testing.assert_allclose(acc, 1.0, atol=1e-6)
    assert save_res[1]["prediction"] == "stop"


def test_decode_batch_no_answers_skips_metrics():
    extra = [{"q_id": 1, "answers": None, "ocr_list": ["a", "<OCR>"]}]
    probs = np.array([[0.9, 0.05, 0.05]], dtype=np.float32)
    res, save_res, anls, acc = decode_batch(
        probs, extra, num_cnt=np.array([2]), label_no_answer=True
    )
    assert anls == 0.0 and acc == 0.0
    assert res[0]["answer"] == "a"
