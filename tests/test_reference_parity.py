"""Parity gate against the ACTUAL reference code (round-1 VERDICT item #2).

Imports `/root/reference`'s torch model (`Models/SDNet.py`, `Models/Layers.py`,
`Models/Bert/modeling.py`), instantiates it with the shipped conf (scaled
lengths/counts, full 768x12 BERT as hard-coded by `SDNet.py:100-101`), pushes
this framework's randomly-initialized params through
`params_to_torch_state` / a shared tiny `pytorch_model.bin`, and asserts

* full-forward logit parity (softmaxed scores) on fixed synthetic batches,
* answer-decode parity vs `SDNetTrainer.predict:378-451` (incl. ANLS/ACC
  bookkeeping), and
* parity on conf variants: ES post_process (the `SDNet.py:292-324` mask
  quirk), position_mod=cat + atted merge, PRE_ALIGN_after_rnn, and
  no_Context_Self_Attention + label_yesno.

This substitutes for the unavailable `submission.json` ANLS gate (artifacts
absent in this environment) and covers every deviation documented in
`docs/PARITY.md` that is reachable without the released checkpoint.

The reference hard-codes `.cuda()` tensor moves (`SDNet.py:288-301`) and
imports spaCy/fasttext at module scope (`Utils/GeneralUtils.py:13`,
`Utils/CoQAUtils.py:26`); the session fixture neutralizes `.cuda()` on CPU
and pre-seeds stub modules. Reference code itself is executed unmodified.
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

B = 2
SEED = 7
BERT_VOCAB = 300
# scaled-down shape caps (semantics-bearing keys stay at shipped values)
OVR = dict(
    max_ocr_num=16, max_od_num=5, max_ocr_len=6, max_od_len=4,
    max_ocr_bert_len=12, max_od_bert_len=8, max_q_len=8, max_q_bert_len=14,
    vocab_size=80,
)


# ---------------------------------------------------------------------------
# reference import harness
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def ref(tmp_path_factory):
    from ruart_tpu.text.featurizer import ENT_MOVES, PTB_TAGS

    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")

        class _Tagger:
            labels = list(PTB_TAGS)

        class _Entity:
            move_names = list(ENT_MOVES)

        class _NLP:
            tagger = _Tagger()
            entity = _Entity()

        spacy.load = lambda *a, **k: _NLP()
        sys.modules["spacy"] = spacy

    try:
        import fasttext  # noqa: F401
    except ImportError:
        ft = types.ModuleType("fasttext")
        ft.load_model = lambda path: None
        sys.modules["fasttext"] = ft

    cphoc = types.ModuleType("Utils.cphoc")
    cphoc.build_phoc = lambda s: [0.0] * 604
    sys.modules.setdefault("Utils.cphoc", cphoc)

    # the reference moves everything to CUDA unconditionally; run it on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import Models.Bert.modeling as modeling
    import Models.Layers as layers
    import Models.SDNet as sdnet
    import Models.SDNetTrainer as trainer

    # shared random 12x768 BERT in the reference's release format
    bert_dir = tmp_path_factory.mktemp("tiny_bert")
    bert_conf = dict(
        vocab_size=BERT_VOCAB, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=512, hidden_act="gelu",
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        max_position_embeddings=64, type_vocab_size=2, initializer_range=0.02,
    )
    with open(bert_dir / "bert_config.json", "w") as f:
        json.dump(bert_conf, f)
    torch.manual_seed(0)
    cfg = modeling.BertConfig.from_json_file(str(bert_dir / "bert_config.json"))
    bert = modeling.BertModel(cfg)
    # from_pretrained loads with prefix 'bert.' (`modeling.py:521`)
    torch.save(
        {"bert." + k: v for k, v in bert.state_dict().items()},
        str(bert_dir / "pytorch_model.bin"),
    )
    return types.SimpleNamespace(
        sdnet=sdnet, layers=layers, modeling=modeling, trainer=trainer,
        bert_dir=str(bert_dir),
    )


def _make_opt(ref, extra=None, remove=()):
    from ruart_tpu.core.config import read_conf_lines
    from ruart_tpu.core.presets import STVQA_CONF

    opt = read_conf_lines(STVQA_CONF.splitlines())
    opt.update(OVR)
    for k in remove:
        opt.pop(k, None)
    if extra:
        opt.update(extra)
    opt["cuda"] = False
    opt["datadir"] = ref.bert_dir
    opt["BERT_model_file"] = ""
    return opt


def _to_ref_batch(q, ocr, od):
    """Fixed-shape [B, N, L] synthetic batch -> the reference's collate
    output format (`VQA_Dataset.py:439-542`): flattened [sum(C), L] candidate
    tensors, per-sample num_cnt / len_cnt, [B, max_num, 8] positions."""

    def long(x):
        return torch.from_numpy(np.asarray(x)).long()

    tq = {k: long(q[k]) for k in ("glove", "fasttext", "pos", "ent", "bert")}
    for k in ("glove", "fasttext", "bert"):
        tq[k + "_mask"] = ~tq[k].eq(0)
    tq["bert_offsets"] = long(q["bert_offsets"])

    def items(block):
        rows = {k: [] for k in ("glove", "fasttext", "pos", "ent", "bert")}
        offs, len_cnt, num_cnt = [], [], []
        for b in range(block["num"].shape[0]):
            cnt = int(block["num"][b])
            num_cnt.append(cnt)
            len_cnt.append([int(block["len"][b, n]) for n in range(cnt)])
            for n in range(cnt):
                for k in rows:
                    rows[k].append(block[k][b, n])
                offs.append(long(block["bert_offsets"][b, n]))
        out = {k: long(np.stack(v)) for k, v in rows.items()}
        for k in ("glove", "fasttext", "bert"):
            out[k + "_mask"] = ~out[k].eq(0)
        out["bert_offsets"] = offs
        out["position"] = torch.from_numpy(np.asarray(block["position"])).float()
        out["num_cnt"] = num_cnt
        out["len_cnt"] = len_cnt
        return out

    return tq, items(ocr), items(od)


def _make_pair(ref, extra=None, remove=()):
    """Build (torch reference net, our model+params, shared batch) with
    identical weights on both sides."""
    import flax
    import jax
    import jax.numpy as jnp

    from ruart_tpu.core.config import Config
    from ruart_tpu.data.synthetic import make_synthetic_batch
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.bert.convert import load_bert_params
    from ruart_tpu.models.fusion.convert import params_to_torch_state
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec

    opt = _make_opt(ref, extra, remove)
    cfg = Config(opt)
    bert_cfg = BertConfig.from_json(
        os.path.join(ref.bert_dir, "bert_config.json")
    )
    spec = ModelSpec.from_config(cfg, bert_cfg)
    model = RUArtModel(spec)

    q, ocr, od, targets = make_synthetic_batch(
        spec, cfg, B, seed=SEED, bert_vocab=BERT_VOCAB
    )
    jq, jocr, jod = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), jq, jocr, jod)
    )
    _, bert_params = load_bert_params(ref.bert_dir)
    params["params"]["Bert"] = bert_params["params"]

    # torch side: same conf, same weights
    torch.manual_seed(1)
    embedding = {
        "glove_embedding": torch.randn(OVR["vocab_size"], 300),
        "fast_embedding": torch.randn(OVR["vocab_size"], 300),
    }
    network = ref.sdnet.SDNet(opt, embedding)
    tstate = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state(params).items()
    }
    result = network.load_state_dict(tstate, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = (
        lambda k: k.startswith("Bert.bert_model.")  # loaded from the shared .bin
        or k.startswith("get_answer.rnn.")  # dead GRU pointer (PARITY.md)
        or k.endswith(".scoring.diagonal")  # frozen do_similarity scalars
    )
    bad = [k for k in result.missing_keys if not allowed(k)]
    assert not bad, f"unmapped reference params: {bad}"

    network.eval()
    network.drop_emb = False
    return types.SimpleNamespace(
        opt=opt, cfg=cfg, spec=spec, model=model, params=params,
        network=network, q=q, ocr=ocr, od=od, targets=targets,
        jq=jq, jocr=jocr, jod=jod,
    )


def _forward_both(pair):
    tq, tocr, tod = _to_ref_batch(pair.q, pair.ocr, pair.od)
    with torch.no_grad():
        ref_scores, _ = pair.network(tq, tocr, tod)
    ours = np.asarray(
        pair.model.apply(pair.params, pair.jq, pair.jocr, pair.jod,
                         deterministic=True)
    )
    return np.asarray(ref_scores), ours


def _assert_close(ref_scores, ours, atol=1e-4):
    assert ref_scores.shape == ours.shape, (ref_scores.shape, ours.shape)
    err = np.max(np.abs(ref_scores - ours))
    assert err < atol, f"max |ref - ours| = {err}"
    assert (ref_scores.argmax(-1) == ours.argmax(-1)).all()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def shipped_pair(ref):
    return _make_pair(ref)


def test_forward_parity_shipped_conf(shipped_pair):
    """Full-forward logit parity on the shipped ST-VQA conf path
    (useES as_ocr split, qk+ position attention, cat merge, label_no_answer,
    PRE_ALIGN_befor_rnn, BERT_LINEAR_COMBINE)."""
    ref_scores, ours = _forward_both(shipped_pair)
    _assert_close(ref_scores, ours)


def test_decode_parity_vs_reference_predict(ref, shipped_pair):
    """Answer strings + ANLS/ACC sums match `SDNetTrainer.predict:378-451`
    run on the actual reference code (dummy trainer shell, real method)."""
    from ruart_tpu.eval.decoder import decode_batch

    pair = shipped_pair
    tq, tocr, tod = _to_ref_batch(pair.q, pair.ocr, pair.od)
    rng = np.random.RandomState(3)
    words = ["stop", "exit", "sale", "42", "coffee", "museum", "north"]
    extra_info = []
    for i in range(B):
        cnt = int(pair.ocr["num"][i])
        ocr_list = [str(rng.choice(words)) for _ in range(cnt - 1)] + ["<OCR>"]
        answers = [str(rng.choice(words))] * int(rng.choice([1, 10]))
        extra_info.append(
            {"q_id": 100 + i, "ocr_list": ocr_list, "answers": answers}
        )
    gt = torch.from_numpy(np.asarray(pair.targets)).float()
    dummy = types.SimpleNamespace(
        network=pair.network, opt=pair.opt, use_cuda=False,
        fixed_answers_len=0, fixed_answers_entry=None,
        loss_func=lambda s, t: torch.tensor(0.0),
    )
    batch = (tq, tocr, tod, gt, extra_info)
    _, ref_anls, ref_acc, ref_res, ref_save = ref.trainer.SDNetTrainer.predict(
        dummy, batch
    )

    _, ours = _forward_both(pair)
    res, save_res, anls_sum, acc_sum = decode_batch(
        ours, extra_info, pair.ocr["num"],
        label_no_answer="label_no_answer" in pair.opt,
    )
    assert [r["answer"] for r in res] == [r["answer"] for r in ref_res]
    assert [r["question_id"] for r in res] == [r["question_id"] for r in ref_res]
    assert [r["idx"] for r in save_res] == [int(r["idx"]) for r in ref_save]
    assert abs(anls_sum - ref_anls) < 1e-6
    assert abs(acc_sum - ref_acc) < 1e-6


def test_forward_parity_packed_tables(shipped_pair):
    """Sequence packing (`bert_pack 1`) keeps logit parity with the ACTUAL
    torch reference: attach packed OCR/OD candidate tables to the same
    batch and compare against the reference forward directly (not merely
    against our own dense path)."""
    import jax.numpy as jnp

    from ruart_tpu.core.config import Config
    from ruart_tpu.data.collate import Collator

    ref_scores, _ = _forward_both(shipped_pair)
    coll = Collator(Config({
        **shipped_pair.cfg.opt, "bert_dedup_frac": 1.0, "bert_pack": 1,
        "bert_pack_len": 16,
    }))
    packed_in = {}
    for name, block in (("ocr", shipped_pair.ocr), ("od", shipped_pair.od)):
        B, N, Lb = block["bert"].shape
        dd = {"bert": block["bert"],
              "bert_mask": (block["bert"] != 0).astype(np.int32)}
        coll._add_dedup(dd, B, N, Lb)
        assert "bert_packed" in dd
        v = dict(block)
        for k in ("bert_packed", "bert_packed_seg", "bert_packed_pos",
                  "bert_unpack", "bert_inverse"):
            v[k] = dd[k]
        packed_in[name] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
    ours = np.asarray(
        shipped_pair.model.apply(
            shipped_pair.params, shipped_pair.jq,
            packed_in["ocr"], packed_in["od"], deterministic=True,
        )
    )
    _assert_close(ref_scores, ours)


def test_forward_parity_compacted_rows(shipped_pair):
    """Candidate-row compaction (`cand_sel`, Collator._add_compact) keeps
    logit parity with the ACTUAL torch reference: sparsify the candidate
    grid (num reduced), attach cand_sel on our side only, and compare
    against the reference forward on the same sparsified batch."""
    import jax.numpy as jnp

    from ruart_tpu.core.config import Config
    from ruart_tpu.data.collate import Collator

    rng = np.random.RandomState(11)
    coll = Collator(Config(dict(shipped_pair.cfg.opt)))
    blocks = {}
    for name in ("ocr", "od"):
        block = {k: np.array(v) for k, v in getattr(shipped_pair, name).items()}
        Bb, N = block["num"].shape[0], block["bert"].shape[1]
        block["num"] = np.minimum(
            block["num"], rng.randint(1, max(2, N // 2), size=Bb)
        ).astype(np.int32)
        coll._add_compact(block, Bb, N)
        assert "cand_sel" in block, f"compaction did not attach for {name}"
        blocks[name] = block
    pair = types.SimpleNamespace(**vars(shipped_pair))
    pair.ocr, pair.od = blocks["ocr"], blocks["od"]
    pair.jocr = {k: jnp.asarray(v) for k, v in blocks["ocr"].items()}
    pair.jod = {k: jnp.asarray(v) for k, v in blocks["od"].items()}
    ref_scores, ours = _forward_both(pair)
    _assert_close(ref_scores, ours)


def test_forward_parity_es_post_process(ref):
    """ES post_process variant: the `SDNet.py:292-324` split + mask quirk
    (first cnt-es_len bits kept when cnt >= es_len, untouched otherwise) and
    the `SDNet.py:418-422` ES_linear/ES_ocr_att merge."""
    pair = _make_pair(ref, extra={"ES_using_way": "post_process"})
    ref_scores, ours = _forward_both(pair)
    _assert_close(ref_scores, ours)


def test_forward_parity_position_cat_atted(ref):
    """position_mod=cat (positions concatenated into the attention inputs,
    `SDNet.py:402-403`) with pos_att_merge_mod=atted (`SDNet.py:406-407`)."""
    pair = _make_pair(
        ref, extra={"position_mod": "cat", "pos_att_merge_mod": "atted"}
    )
    ref_scores, ours = _forward_both(pair)
    _assert_close(ref_scores, ours)


def test_prealign_after_rnn_is_broken_in_reference(ref):
    """PRE_ALIGN_after_rnn is dead code in the reference: `SDNet.py:332-336`
    tuple-unpacks `self.pre_align(...)` (which returns a single tensor when
    `return_score` is not passed, `Layers.py:292-295`), so the 'prealign'
    becomes a 2-D slice and `DeepAttention` crashes on `torch.cat(..., 2)`
    (`Layers.py:499`). Without PRE_ALIGN_befor_rnn it dies even earlier on
    the never-populated `q_list['glove_emb']` (`SDNet.py:456-459,335`).
    This test pins the crash; our framework implements the documented intent
    instead (see docs/PARITY.md) and must still run."""
    pair = _make_pair(ref, extra={"PRE_ALIGN_after_rnn": True})
    tq, tocr, tod = _to_ref_batch(pair.q, pair.ocr, pair.od)
    with pytest.raises((IndexError, RuntimeError)):
        with torch.no_grad():
            pair.network(tq, tocr, tod)
    ours = np.asarray(
        pair.model.apply(pair.params, pair.jq, pair.jocr, pair.jod,
                         deterministic=True)
    )
    assert np.isfinite(ours).all()


def test_forward_parity_merge_original_no_deep_attention(ref):
    """pos_att_merge_mod=original (`SDNet.py:408-409`, position attention
    computed but discarded) with no_DeepAttention (`Layers.py:477-479,513-514`:
    inter-attention skipped, the deep-attn RNN runs on the concatenated
    abstraction layers alone). Note multi2one_bidir=True is unreachable in
    the reference: DeepAttention shares one Linear(att_size) across the
    candidate (600+500-dim) and question (300+500-dim) sides
    (`Layers.py:226-227`), which only type-checks because the shipped conf
    keeps multi2one_output == word_dim == 300."""
    pair = _make_pair(
        ref,
        extra={"pos_att_merge_mod": "original", "no_DeepAttention": True},
    )
    ref_scores, ours = _forward_both(pair)
    _assert_close(ref_scores, ours)


def test_forward_parity_no_self_attn_yesno(ref):
    """no_Context_Self_Attention (`SDNet.py:383-385`) + label_yesno head
    (`Layers.py:405-411` noread/yes/no scores prepended)."""
    pair = _make_pair(
        ref,
        extra={"no_Context_Self_Attention": True, "label_yesno": True},
    )
    ref_scores, ours = _forward_both(pair)
    _assert_close(ref_scores, ours)
