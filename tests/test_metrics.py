import numpy as np
import pytest

from ruart_tpu.eval import metrics


def test_levenshtein_basic():
    assert metrics.levenshtein("abc", "bd") == 2
    assert metrics.levenshtein("", "abc") == 3
    assert metrics.levenshtein("kitten", "sitting") == 3
    assert metrics.levenshtein("same", "same") == 0


def test_anls_score_matches_reference_semantics():
    # 1 - LD/maxlen, case-insensitive, empty-empty = 1
    assert metrics.anls_score("abc", "bd") == pytest.approx(1 - 2 / 3)
    assert metrics.anls_score("ABC", "abc") == 1.0
    assert metrics.anls_score("", "") == 1.0
    assert metrics.anls_score("", "ab") == 0.0  # 1 - 2/2


def test_note_stvqa_and_threshold():
    gts = ["hello", "world"]
    assert metrics.note_stvqa(gts, "hello") == 1.0
    s = metrics.note_stvqa(gts, "helo")
    assert 0 < s < 1
    assert metrics.final_anls(0.49) == 0.0
    assert metrics.final_anls(0.5) == 0.5


def test_note_textvqa_and_cap():
    gts = ["yes"] * 4 + ["no"] * 6
    assert metrics.note_textvqa(gts, "yes") == pytest.approx(0.4)
    assert metrics.final_acc(0.4, 10) == 1.0  # 0.4*10/3 > 1
    assert metrics.final_acc(0.2, 10) == pytest.approx(2 / 3)
    assert metrics.final_acc(0.05, 1) == pytest.approx(0.5)


def test_levenshtein_batch_matches_scalar():
    rng = np.random.RandomState(0)
    alphabet = list("abcdef ")
    cands = [
        "".join(rng.choice(alphabet, size=rng.randint(0, 12)).tolist())
        for _ in range(50)
    ]
    cands.append("")
    query = "cafe bad"
    batch = metrics.levenshtein_batch(query, cands)
    ref = np.array([metrics.levenshtein(query, c) for c in cands])
    np.testing.assert_array_equal(batch, ref)


def test_anls_batch_matches_scalar():
    gts = ["stop sign", "stop"]
    cands = ["stop", "sign", "stop sign", "", "STOP"]
    batch = metrics.anls_batch(gts, cands)
    ref = np.array([metrics.note_stvqa(gts, c.lower()) for c in cands], dtype=np.float32)
    np.testing.assert_allclose(batch, ref, atol=1e-6)


def test_labels():
    gts = ["exit", ""]
    ocr = ["enter", "exit", "ex1t"]
    idx, score = metrics.stvqa_label(gts, ocr)
    assert idx == 1 and score == 1.0
    assert metrics.stvqa_label(["", ""], ocr) is None
    idx, score = metrics.textvqa_label(["exit"] * 3, ocr)
    assert idx == 1 and score == pytest.approx(0.3)
