"""Test harness: force JAX onto CPU with 8 virtual devices so mesh/sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication (d))."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The JAX_PLATFORMS env var is ignored in this environment (the experimental
# 'axon' TPU plugin wins platform selection), so pin the platform via the
# config API before any computation runs.
import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def shipped_conf_opt():
    """Option dict equivalent to the reference's shipped ST-VQA conf (test
    fixture copy; parsing semantics are tested separately)."""
    from ruart_tpu.core.config import read_conf_lines

    return read_conf_lines(SHIPPED_CONF.splitlines())


# A faithful in-repo copy of the semantics-bearing keys of the reference's
# shipped `conf` (model dims, length caps, embedding lists, label policy).
SHIPPED_CONF = """\
Task   test
score_name ANLS
lable_way   lable_all_with_threshold
score_threshold 0.5
mask_score
label_no_answer
max_ocr_num 100
max_od_num  30
max_ocr_len 20
max_od_len  10
max_ocr_bert_len    30
max_od_bert_len 10
max_q_len   40
max_q_bert_len  50
GLOVE
glove_dim 300
FastText
fast_dim 300
q_embedding glove,pos,ent,bert
ocr_embedding  fasttext,pos,ent,bert
q_emb_initial glove
ocr_emb_initial  fasttext
loss    BCE_D1
optimizer   #
batch_size  16
lr 0.001
max_batch_num	3000
epoch 30
LN
DROPOUT	0.3
VARIATIONAL_DROPOUT
BERT
dropout_emb	0.4
LOCK_BERT
BERT_LINEAR_COMBINE
SEED	1033
QUES_SELF_ATTN
concat_rnn	False
grad_clipping	 10
do_seq_dropout
TUNE_PARTIAL
tune_partial	1000
embedding_dim	300
prealign_hidden	300
PRE_ALIGN
PRE_ALIGN_befor_rnn
pos_dim	12
ent_dim	8
query_self_attn_hidden_size	300
hidden_size	125
deep_att_hidden_size_per_abstr	250
in_rnn_layers	2
highlvl_hidden_size	125
question_high_lvl_rnn_layers	1
multi2one_hidden_size   300
multi2one_bidir False
position_dim    8
position_mod    qk+
pos_att_merge_mod   cat
n_gram  2
ocr_name_list   ocr_PMTD_ASTER,ocr_PMTD_ASTER_gram2
od_name_list OD_bottom-up
useES
ES_ocr  ES_ocr
ES_ocr_len  10
ES_sort_way frequency
ES_using_way    as_ocr
"""
