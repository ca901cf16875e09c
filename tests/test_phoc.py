import numpy as np
import pytest

from ruart_tpu.core.constants import PHOC_DIM
from ruart_tpu.text import phoc as phoc_mod
from ruart_tpu.ops import phoc as phoc_jax

WORDS = [
    "a", "ab", "abc", "the", "hello", "beyond", "stop",
    "exit", "0", "42", "2019", "deadbeef", "thethethe",
    "pad", "unk", "q", "ocr", "od",
    "", "x" * 30, "mixed123", "ll", "ellell",
]


def test_native_matches_python_oracle():
    for w in WORDS:
        native = phoc_mod.build_phoc(w)
        oracle = phoc_mod.build_phoc_py(w)
        np.testing.assert_array_equal(native, oracle, err_msg=f"word={w!r}")
        assert native.shape == (PHOC_DIM,)
        assert set(np.unique(native)).issubset({0.0, 1.0})


def test_filtering_matches_reference_wrapper():
    # "He-LLO!" -> "hello"
    np.testing.assert_array_equal(
        phoc_mod.build_phoc("He-LLO!"), phoc_mod.build_phoc("hello")
    )
    # empty after filtering -> all zeros
    assert phoc_mod.build_phoc("!!!").sum() == 0


def test_batch_matches_single():
    batch = phoc_mod.build_phoc_batch(WORDS)
    assert batch.shape == (len(WORDS), PHOC_DIM)
    for i, w in enumerate(WORDS):
        np.testing.assert_array_equal(batch[i], phoc_mod.build_phoc(w))


def test_known_structure():
    # single char 'a': occupies [0,1]; every region with >=50% of [0,1]?
    # overlap(region)/1 >= 0.5 only for regions covering >= half the word:
    # level2 regions have len 0.5 -> frac 0.5 -> both set.
    v = phoc_mod.build_phoc("a")
    # level-2 rows are dims [0:36] and [36:72]; char 'a' = index 0
    assert v[0] == 1.0 and v[36] == 1.0
    # level-5 regions have length 0.2 < 0.5 -> none set
    lvl5 = v[9 * 36 : 14 * 36]
    assert lvl5.sum() == 0
    # bigram 'th' in "the" (3 chars): occupies [0, 2/3]
    t = phoc_mod.build_phoc("the")
    bi = t[504:]
    assert bi.sum() > 0


def test_jax_op_matches_native():
    ids, lens = phoc_jax.encode_char_ids(WORDS, max_len=32)
    dev = np.asarray(phoc_jax.phoc_batch_jit(ids, lens))
    ref = phoc_mod.build_phoc_batch(WORDS)
    np.testing.assert_array_equal(dev, ref)


def test_jax_op_batch_shapes():
    ids, lens = phoc_jax.encode_char_ids(["abc", "de"], max_len=8)
    ids3 = ids.reshape(1, 2, 8)
    lens3 = lens.reshape(1, 2)
    out = phoc_jax.phoc_from_char_ids(ids3, lens3)
    assert out.shape == (1, 2, PHOC_DIM)


def test_boundary_case_len3_fp32():
    """len-3 strings: char 1 spans [1/3, 2/3]; in fp32 the level-2 region-0
    overlap fraction rounds to 0.49999997 (< 0.5, region misses) while the
    region-1 fraction rounds to 0.50000006 (fires) — an asymmetry a float64
    implementation would not reproduce. Guards bit-faithfulness of all three
    implementations on the knife edge."""
    for v in (
        phoc_mod.build_phoc("abc"),
        phoc_mod.build_phoc_py("abc"),
        np.asarray(
            phoc_jax.phoc_batch_jit(*phoc_jax.encode_char_ids(["abc"], max_len=4))
        )[0],
    ):
        assert v[0 * 36 + 1] == 0.0  # 'b' misses level-2 region 0
        assert v[1 * 36 + 1] == 1.0  # 'b' fires level-2 region 1
