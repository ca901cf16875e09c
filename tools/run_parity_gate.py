#!/usr/bin/env python
"""One-command real-artifact parity gate (VERDICT r2 missing #4).

Given a datadir laid out like the reference release (`/root/reference`):

    <datadir>/conf                              — the shipped inference conf
    <datadir>/conf~/model/ANLS_best_model.pt    — released torch checkpoint
    <datadir>/conf~/model/submission.json       — golden ST-VQA predictions
    <datadir>/source/...                        — preprocessed msgpack data,
                                                  GloVe/fastText/BERT release
                                                  (per `readme.md:12-27`)

this script:
  1. converts the released checkpoint into this framework's param tree
     (`ruart_tpu.models.fusion.convert.load_sdnet_checkpoint`),
  2. runs the `main_test.py`-equivalent inference path end-to-end
     (preprocess -> dataset -> jitted forward -> decode -> submission.json),
  3. scores the produced submission against the golden one: exact-match
     rate and mean ANLS treating the golden answers as ground truth
     (`Utils/eval_func.py:1-35` kernel), plus true ANLS for both if an
     ST-VQA ground-truth json is supplied via --gt.

When the artifacts are absent (this repo ships none — the reference release
data is external), it prints exactly what is missing and exits 0 so CI can
call it unconditionally. A completed run exits non-zero if the ANLS
agreement falls below the BASELINE.json gate (0.1 abs).

Usage:
    python tools/run_parity_gate.py --datadir /path/to/release \
        [--conf_file conf] [--gt stvqa_task3_gt.json] [--threshold 0.9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def check_artifacts(datadir: str, conf_file: str):
    """Returns (ok, missing list)."""
    missing = []
    conf_path = os.path.join(datadir, conf_file)
    if not os.path.isfile(conf_path):
        missing.append(f"conf file: {conf_path}")
        return False, missing
    ckpt = os.path.join(datadir, "conf~", "model", "ANLS_best_model.pt")
    if not os.path.isfile(ckpt):
        missing.append(f"released checkpoint: {ckpt}")
    golden = os.path.join(datadir, "conf~", "model", "submission.json")
    if not os.path.isfile(golden):
        missing.append(f"golden submission: {golden}")
    if not os.path.isdir(os.path.join(datadir, "source")):
        missing.append(f"source/ data folder: {os.path.join(datadir, 'source')}")
    return not missing, missing


def anls(pred: str, gts) -> float:
    """ST-VQA ANLS for one prediction vs a list of ground truths
    (`Utils/eval_func.py:1-35`): 1 - NLD, zeroed below 0.5."""
    from ruart_tpu.eval.metrics import anls_score

    best = max((anls_score(pred, gt) for gt in gts), default=0.0)
    return best if best >= 0.5 else 0.0


def score_submissions(ours, golden, gt_path=None):
    by_qid_ours = {r["question_id"]: str(r["answer"]) for r in ours}
    by_qid_gold = {r["question_id"]: str(r["answer"]) for r in golden}
    common = sorted(set(by_qid_ours) & set(by_qid_gold))
    report = {
        "n_ours": len(by_qid_ours),
        "n_golden": len(by_qid_gold),
        "n_common": len(common),
    }
    if common:
        exact = sum(
            by_qid_ours[q].strip().lower() == by_qid_gold[q].strip().lower()
            for q in common
        )
        agree = sum(
            anls(by_qid_ours[q].lower(), [by_qid_gold[q].lower()])
            for q in common
        )
        report["exact_match"] = exact / len(common)
        report["anls_vs_golden"] = agree / len(common)
    if gt_path and os.path.isfile(gt_path):
        with open(gt_path) as f:
            gt = json.load(f)
        # accept either {"data": [{question_id, answers: [...]}]} or a flat list
        entries = gt.get("data", gt) if isinstance(gt, dict) else gt
        gt_by_qid = {
            e["question_id"]: [str(a).lower() for a in e.get("answers", [])]
            for e in entries
            if "question_id" in e
        }
        for name, preds in (("ours", by_qid_ours), ("golden", by_qid_gold)):
            qs = sorted(set(preds) & set(gt_by_qid))
            if qs:
                report[f"anls_{name}_vs_gt"] = sum(
                    anls(preds[q].lower(), gt_by_qid[q]) for q in qs
                ) / len(qs)
    return report


def main(argv=None, bert_config=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--datadir", default="/root/reference",
                    help="release root (conf, conf~/model, source/)")
    ap.add_argument("--conf_file", default="conf")
    ap.add_argument("--gt", default=None,
                    help="optional ST-VQA task-3 ground-truth json")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="min ANLS-vs-golden to pass (BASELINE gate: "
                         "parity within 0.1 abs)")
    args = ap.parse_args(argv)

    ok, missing = check_artifacts(args.datadir, args.conf_file)
    if not ok:
        print("PARITY GATE SKIPPED — required release artifacts not present:")
        for m in missing:
            print(f"  - {m}")
        print(
            "Provide the reference release (readme.md:12-27: preprocessed "
            "msgpack data, GloVe/fastText/BERT files, ANLS_best_model.pt) "
            "and re-run."
        )
        return 0

    import jax.numpy as jnp
    import jax

    from ruart_tpu.cli.main import apply_runtime_flags, build_config, setup_logging
    from ruart_tpu.models.fusion.convert import load_sdnet_checkpoint
    from ruart_tpu.train.trainer import Trainer

    setup_logging("")
    # the inference path writes its submission into the folder of
    # MODEL_PATH — the same conf~/model/ that holds the golden file (that
    # is how the release artifact was produced, `readme.md:32-37`) — so
    # capture the golden content BEFORE running
    golden_path = os.path.join(args.datadir, "conf~", "model", "submission.json")
    with open(golden_path) as f:
        golden = json.load(f)

    cfg = build_config(os.path.join(args.datadir, args.conf_file))
    cfg.opt["datadir"] = args.datadir
    apply_runtime_flags(cfg)

    trainer = Trainer(cfg, bert_config=bert_config)
    trainer.get_save_folder(is_train=False)
    trainer.preproc.ensure_preprocessed()
    _, _, embeddings = trainer.preproc.load_data()
    trainer.setup_model(embeddings)

    pt_path = os.path.join(args.datadir, "conf~", "model", "ANLS_best_model.pt")
    print(f"converting released checkpoint {pt_path} ...")
    params = load_sdnet_checkpoint(pt_path, trainer.state.params)
    trainer.state = trainer.state._replace(
        params=jax.tree.map(jnp.asarray, params)
    )

    print("running test inference (main_test.py path) ...")
    test_raw = trainer._load_split("test")
    test_data = trainer._dataset(test_raw, "test")
    trainer.run_eval(test_data, 0, mode="test")

    ours_path = os.path.join(trainer.save_folder, "submission.json")
    with open(ours_path) as f:
        ours = json.load(f)

    report = score_submissions(ours, golden, args.gt)
    print(json.dumps(report, indent=2))
    agreement = report.get("anls_vs_golden", 0.0)
    if agreement < args.threshold:
        print(
            f"PARITY GATE FAILED: ANLS vs golden {agreement:.4f} < "
            f"threshold {args.threshold}"
        )
        return 1
    print(f"PARITY GATE PASSED: ANLS vs golden {agreement:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
