from ruart_tpu.text.wordpiece import (
    BasicTokenizer,
    WordPieceTokenizer,
    WordpieceTokenizer,
    build_demo_vocab,
)


def test_basic_tokenizer_lower_punct():
    bt = BasicTokenizer(do_lower_case=True)
    assert bt.tokenize("Hello, WORLD!") == ["hello", ",", "world", "!"]
    assert bt.tokenize("  a\tb\nc ") == ["a", "b", "c"]
    # accents stripped under lowercasing
    assert bt.tokenize("Café") == ["cafe"]
    # CJK chars split out individually
    assert bt.tokenize("ab中文cd") == ["ab", "中", "文", "cd"]


def test_wordpiece_greedy():
    vocab = {"un": 0, "##aff": 1, "##able": 2, "[UNK]": 3, "runn": 4, "##ing": 5}
    wp = WordpieceTokenizer(vocab)
    assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert wp.tokenize("running") == ["runn", "##ing"]
    assert wp.tokenize("xyz") == ["[UNK]"]
    assert wp.tokenize("x" * 200) == ["[UNK]"]


def test_end_to_end_with_vocab():
    vocab = build_demo_vocab(["stop", "sign", "##s"])
    tok = WordPieceTokenizer(vocab)
    pieces = tok.tokenize("Stop Signs!")
    assert pieces[0] == "stop"
    assert pieces[1:3] == ["sign", "##s"]
    assert pieces[-1] == "!"
    ids = tok.convert_tokens_to_ids(pieces)
    assert tok.convert_ids_to_tokens(ids) == pieces


def test_bertify_word_list_offsets():
    vocab = build_demo_vocab(["stop", "sign"])
    tok = WordPieceTokenizer(vocab)
    ids, offsets = tok.bertify(["stop", "sign", "xq9"])
    # [CLS] stop sign x q 9 [SEP] -> per-word spans
    assert offsets[0] == (1, 2)
    assert offsets[1] == (2, 3)
    assert offsets[2] == (3, 6)  # 'xq9' -> 3 char pieces ('x','##q','##9')
    assert ids[0] == vocab["[CLS]"] and ids[-1] == vocab["[SEP]"]
    # empty word list quirk (VQA_Dataset.py:426-427)
    ids2, offsets2 = tok.bertify([])
    assert tuple(offsets2) == ((1, 1),)
    assert len(ids2) == 2


def test_bertify_raw_string():
    vocab = build_demo_vocab(["what", "is"])
    tok = WordPieceTokenizer(vocab)
    ids, offsets = tok.bertify("What is")
    assert tuple(offsets) == ()
    assert len(ids) == 4
