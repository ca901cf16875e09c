#!/usr/bin/env python
"""Host-pipeline stage decomposition at serving shapes.

Times each host stage of the online path per batch — request->raw-datum
conversion, featurization (tagging, n-gram synthesis, id assignment),
dataset item build, collation (dense and packed) — plus the end-to-end
``InferenceEngine.featurize``. These are the stages that must stay below
the device step time for the two-stage serving pipeline to remain
device-bound (`ruart_tpu/serve.py::BatchingServer`).

Run on an idle host (the numbers are pure single-thread python):

    python tools/profile_host.py [batch_size] [iters]

Numbers feed PROGRESS_NOTES.md / docs/ARCHITECTURE.md "Performance notes".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-path only; never touch TPU


def med(f, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


def main(batch_size: int = 256, iters: int = 9):
    from bench import build_corpus_model
    from ruart_tpu.data.collate import Collator
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.serve import InferenceEngine
    from ruart_tpu.utils.gctune import tune_gc

    tune_gc()
    cfg, ds, tok, pre, spec, model, coll, params = build_corpus_model(
        8, "float32", 8
    )
    raw = make_synthetic_raw_dataset(
        batch_size, seed=3, n_ocr_range=(15, 30), n_es=40, with_answers=False
    )["data"]
    reqs = [
        {"question": d["question"], "image_width": d["image_width"],
         "image_height": d["image_height"], "ocr": d["ocr_PMTD_ASTER"],
         "od": d["OD_bottom-up"], "es": d["ES_ocr"]}
        for d in raw
    ]
    engine = InferenceEngine(cfg, spec, params, pre.train_vocab, tok)
    P = engine._pre

    dsf = engine.featurize(reqs)  # warm tokenizer/bertify caches once
    items = [dsf[i] for i in range(len(dsf))]

    print(f"batch {batch_size}, medians of {iters} (ms):")
    print(f"  featurize                {med(lambda: engine.featurize(reqs), iters):7.1f}")
    raw2 = [engine._to_raw_datum(s, i) for i, s in enumerate(reqs)]
    print(f"    to_raw_datum           {med(lambda: [engine._to_raw_datum(s, i) for i, s in enumerate(reqs)], iters):7.1f}")
    data = P._process_data(raw2)
    print(f"    process_data           {med(lambda: P._process_data(raw2), iters):7.1f}")
    print(f"    assign_ids             {med(lambda: P._assign_ids(data), iters):7.1f}")
    print(f"  item build               {med(lambda: [dsf[i] for i in range(len(dsf))], iters):7.1f}")
    print(f"  collate (dense)          {med(lambda: coll(items), iters):7.1f}")
    cfg.opt["bert_pack"] = 1
    collp = Collator(cfg)
    print(f"  collate (packed)         {med(lambda: collp(items), iters):7.1f}")
    del cfg.opt["bert_pack"]


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
