from ruart_tpu.core.config import Config, read_conf_lines


def test_conf_parse_semantics(tmp_path):
    text = """\
# a comment
FLAG
int_key 5
float_key 0.5
bool_key False
str_key hello
dup 1
dup 2
tab_key\t7
three part line
"""
    opt = read_conf_lines(text.splitlines())
    assert opt["FLAG"] is True
    assert opt["int_key"] == 5 and isinstance(opt["int_key"], int)
    assert opt["float_key"] == 0.5 and isinstance(opt["float_key"], float)
    assert opt["bool_key"] is False
    assert opt["str_key"] == "hello"
    assert opt["dup"] == 1  # first wins
    assert opt["tab_key"] == 7
    assert "three" not in opt  # >2 fields ignored like the reference


def test_shipped_conf_dimension_flow(shipped_conf_opt):
    """The derived dims must match the reference's printed size bookkeeping
    for the shipped ST-VQA conf (hand-computed from SDNet.__init__)."""
    cfg = Config(shipped_conf_opt)
    d = cfg.dims
    # ocr: fasttext 300 + pos 12 + ent 8 + bert 768 + prealign 300
    assert d.x_input_size == 1388
    # q: glove 300 + pos 12 + ent 8 + bert 768
    assert d.ques_input_size == 1088
    assert d.multi2one_output == 300  # unidirectional hidden 300
    assert d.context_rnn_output == 250
    assert d.ques_rnn_output == 250
    assert d.word_hidden_size == 300
    assert d.deep_att_size == 800          # 250*2 + 300
    assert d.deep_attn_input_size == 1250  # 250*2*2 + 250
    assert d.deep_attn_output_size == 250
    assert d.high_lvl_ques_output == 250
    assert d.self_attn_input_size == 1800  # 250 + 1250 + 300
    assert d.self_attn_output_size == 250
    assert d.context_final_size == 250
    assert d.ques_final_size == 250
    assert d.position_att_output_size == 250
    assert d.ocr_final_size == 500         # cat merge
    assert d.bert_dim == 768 and d.bert_layers == 12
    assert d.num_scores == 101             # 100 ocr + no_answer
    assert cfg.yesno_num == 0
    assert cfg.es_ocr_len == 10


def test_config_dictlike(shipped_conf_opt):
    cfg = Config(shipped_conf_opt)
    assert "GLOVE" in cfg
    assert "nonexistent" not in cfg
    assert cfg["hidden_size"] == 125
    assert cfg.get("nothere", 3) == 3
    assert cfg.q_embedding == ["glove", "pos", "ent", "bert"]
    assert cfg.dropout_p == 0.3
    assert cfg.seed == 1033


def test_bert_large_artifact_redirection():
    """BERT_LARGE selects the *_large_* artifact keys (`Bert.py:26-28`,
    `VQA_Dataset.py:49-58`), falling back to the base keys when absent."""
    from ruart_tpu.train.trainer import resolve_bert_artifacts

    base = {
        "BERT_tokenizer_file": "bert-base/vocab.txt",
        "BERT_model_file": "bert-base",
        "BERT_large_tokenizer_file": "bert-large/vocab.txt",
        "BERT_large_model_file": "bert-large",
    }
    assert resolve_bert_artifacts(base) == ("bert-base/vocab.txt", "bert-base")
    assert resolve_bert_artifacts({**base, "BERT_LARGE": True}) == (
        "bert-large/vocab.txt",
        "bert-large",
    )
    # partial conf: large flag but only base keys present
    small = {
        "BERT_LARGE": True,
        "BERT_tokenizer_file": "bert-base/vocab.txt",
        "BERT_model_file": "bert-base",
    }
    assert resolve_bert_artifacts(small) == ("bert-base/vocab.txt", "bert-base")


def test_bert_large_spec_dims(shipped_conf_opt):
    """BERT_LARGE flows to the 1024-wide 24-layer config (`SDNet.py:95-101`)."""
    from ruart_tpu.core.config import Config
    from ruart_tpu.models.fusion.spec import ModelSpec

    opt = dict(shipped_conf_opt)
    opt["BERT_LARGE"] = True
    spec = ModelSpec.from_config(Config(opt))
    assert spec.bert.hidden_size == 1024
    assert spec.bert.num_hidden_layers == 24
