#!/usr/bin/env python
"""Measure the REFERENCE's CPU batch-1 inference throughput.

Times the actual torch reference model (`/root/reference/Models/SDNet.py`
driven the way `main_test.py:14-34` + `SDNetTrainer.predict:378-401` drive
it: single process, batch 1, no_grad forward) on a synthetic batch at the
shipped ST-VQA shapes, with random weights (weights don't change FLOPs) and
a BERT-base-dimensioned encoder in the release format.

This anchors `bench.py`'s ``vs_baseline`` to the reference itself instead
of this framework's own CPU path (round-1 VERDICT item #5). Prints one
line ``TORCH_BASELINE_QPS=<float>``; run via ``python bench_reference.py``
or let ``bench.py`` invoke it lazily and cache the result.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

REF = os.environ.get("RUART_REFERENCE", "/root/reference")
REPO = os.path.dirname(os.path.abspath(__file__))
VOCAB = 5000        # word-vector vocab; lookup cost is size-independent
BERT_VOCAB = 5000   # ditto for wordpiece ids (keeps the .bin small)


def _stub_reference_imports():
    """The reference imports spaCy/fasttext/cphoc at module scope and moves
    tensors to CUDA unconditionally; neutralize both for a CPU run (same
    recipe as tests/test_reference_parity.py — reference code itself runs
    unmodified)."""
    import torch

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
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _write_release_bert(dirname: str):
    """Random BERT-base (768 x 12 x 3072) in the reference's release layout
    (`bert_config.json` + `pytorch_model.bin` with the 'bert.' prefix
    `modeling.py:521` strips)."""
    import torch

    import Models.Bert.modeling as modeling

    conf = dict(
        vocab_size=BERT_VOCAB, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        max_position_embeddings=512, type_vocab_size=2,
        initializer_range=0.02,
    )
    with open(os.path.join(dirname, "bert_config.json"), "w") as f:
        json.dump(conf, f)
    torch.manual_seed(0)
    cfg = modeling.BertConfig.from_json_file(
        os.path.join(dirname, "bert_config.json")
    )
    bert = modeling.BertModel(cfg)
    torch.save(
        {"bert." + k: v for k, v in bert.state_dict().items()},
        os.path.join(dirname, "pytorch_model.bin"),
    )


def _shipped_opt(bert_dir: str) -> dict:
    from ruart_tpu.core.config import read_conf_lines
    from ruart_tpu.core.presets import STVQA_CONF

    opt = read_conf_lines(STVQA_CONF.splitlines())
    opt["vocab_size"] = VOCAB
    opt["cuda"] = False
    opt["datadir"] = bert_dir
    opt["BERT_model_file"] = ""
    return opt


def _to_ref_batch(q, ocr, od):
    """Fixed-shape [B, N, L] synthetic tensors -> the reference's collate
    format (`VQA_Dataset.py:439-542`): flattened [sum(C), L] candidates,
    per-sample num_cnt / len_cnt, [B, max_num, 8] positions."""
    import numpy as np
    import torch

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
        out["position"] = torch.from_numpy(
            np.asarray(block["position"])
        ).float()
        out["num_cnt"] = num_cnt
        out["len_cnt"] = len_cnt
        return out

    return tq, items(ocr), items(od)


def measure_reference_qps(iters: int = 3, warmup: int = 1) -> float:
    sys.path.insert(0, REPO)
    _stub_reference_imports()

    import numpy as np
    import torch

    with tempfile.TemporaryDirectory() as bert_dir:
        _write_release_bert(bert_dir)
        opt = _shipped_opt(bert_dir)

        import Models.SDNet as sdnet

        from ruart_tpu.core.config import Config
        from ruart_tpu.data.synthetic import make_synthetic_batch
        from ruart_tpu.models.bert.config import BertConfig
        from ruart_tpu.models.fusion.spec import ModelSpec

        cfg = Config(opt)
        spec = ModelSpec.from_config(
            cfg,
            BertConfig.from_json(os.path.join(bert_dir, "bert_config.json")),
        )
        q, ocr, od, _ = make_synthetic_batch(
            spec, cfg, 1, seed=0, bert_vocab=BERT_VOCAB
        )
        tq, tocr, tod = _to_ref_batch(q, ocr, od)

        torch.manual_seed(1)
        embedding = {
            "glove_embedding": torch.randn(VOCAB, 300),
            "fast_embedding": torch.randn(VOCAB, 300),
        }
        network = sdnet.SDNet(opt, embedding)
        network.eval()
        network.drop_emb = False

        with torch.no_grad():
            for _ in range(warmup):
                network(tq, tocr, tod)
            t0 = time.perf_counter()
            for _ in range(iters):
                scores, _ = network(tq, tocr, tod)
            _ = np.asarray(scores)
            dt = time.perf_counter() - t0
    return iters / dt


if __name__ == "__main__":
    qps = measure_reference_qps()
    print("TORCH_BASELINE_QPS=" + repr(qps))
