#!/usr/bin/env python
"""Fine-grained stage decomposition of the flagship forward via XLA DCE.

For each top-level submodule (`Bert`, `multi2one`, `deep_attn`, ...) we jit a
function that runs the full forward but returns ONLY that submodule's
captured outputs (flax ``capture_intermediates``). XLA dead-code-eliminates
everything downstream of the cut, so the measured time is "cost of computing
everything up to and including this stage" — consecutive deltas localize the
cost of each stage at the REAL bench shapes (dedup + packing included),
something synthetic per-layer timings can't do.

Run on the TPU:

    python tools/profile_fusion.py [batch_size] [pack] [dtype]

Numbers feed PROGRESS_NOTES.md / docs/ARCHITECTURE.md "Performance notes".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ruart_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

# forward order (see RUArtModel.__call__); each entry is a top-level
# submodule name whose captured output becomes the jitted return value.
# "name:i" selects the i-th CALL of that submodule (flax captures one
# entry per invocation) — the other calls DCE away, so per-call costs of
# the three Bert invocations (q=0, ocr=1, od=2) are separable.
CUTS = [
    "Bert:0",                # question encode (first call, in q _embed)
    "Bert:1",                # OCR encode (packed/unique table)
    "Bert:2",                # OD encode
    "Bert",                  # 3 encoder calls (ocr packed/unique, od, q)
    "pre_align",             # word-level q<->cand attention (glove space)
    "cand_emb:0",            # OCR embed+pool+pre_align (multi2one INPUT)
    "cand_emb:1",            # OD embed+pool+pre_align
    "multi2one:0",           # OCR branch only (embed+pool+pre_align+m2o)
    "multi2one:1",           # OD branch only
    "multi2one",             # per-candidate BiLSTM (includes embed+pooling)
    "context_rnn",           # 2-layer BiLSTM over ocr & od candidates
    "ques_rnn",              # 2-layer BiLSTM over question words
    "high_lvl_ques_rnn",
    "deep_attn",             # history-of-word inter-attention (ocr & od)
    "highlvl_self_att",
    "high_lvl_context_rnn",
    "od_ocr_attn",           # position-aware OD->OCR attention
    "ques_merger",
    "get_answer",            # final scores == full forward
]


def fence_timeit(f, *a, iters=10, warmup=2):
    """Wall time with a small device->host fetch as the completion fence
    (the axon tunnel's block_until_ready returns early)."""
    for _ in range(warmup):
        o = f(*a)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:4])
    return (time.perf_counter() - t0) / iters


def main(batch_size=256, pack=True, dtype="bfloat16"):
    from bench import build_flagship

    fn, params, batch = build_flagship(batch_size, dtype=dtype, pack=pack)
    q, ocr, od = batch

    # rebuild the model the same way build_flagship does, so cut functions
    # share params with the full jitted forward
    from ruart_tpu.core.presets import stvqa_config
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec

    cfg = stvqa_config(vocab_size=5000, batch_size=batch_size)
    cfg.opt["bert_pack"] = 1 if pack else 0
    spec = ModelSpec.from_config(cfg, BertConfig(dtype=dtype))
    model = RUArtModel(spec)

    def cut_fn(name):
        name, _, idx = name.partition(":")
        # dotted names cut at a NESTED submodule (e.g. "deep_attn.rnn")
        path = tuple(name.split("."))

        def run(p, q, ocr, od):
            _, state = model.apply(
                p, q, ocr, od,
                capture_intermediates=lambda mdl, _m: mdl.path == path,
                mutable=["intermediates"],
            )
            # sum-reduce the captured activations: forces the full upstream
            # computation but keeps output buffers scalar (full activations
            # for every call site OOM the chip at batch 256)
            out = state["intermediates"]
            for part in path:
                out = out[part]
            if isinstance(out, dict):
                out = out["__call__"]   # submodule call capture
            # else: an explicit self.sow(...) cut point (tuple per call)
            if idx:
                out = out[int(idx)]  # single call: the others DCE away
            return jax.tree.map(lambda t: t.astype(jnp.float32).sum(), out)

        return jax.jit(run)

    t_full = fence_timeit(fn, params, q, ocr, od)
    print(f"full forward b{batch_size} pack={int(pack)} {dtype}: "
          f"{t_full*1e3:.1f} ms -> {batch_size/t_full:.1f} q/s", flush=True)

    prev = 0.0
    rows = []
    for name in CUTS:
        try:
            t = fence_timeit(cut_fn(name), params, q, ocr, od)
        except (KeyError, IndexError):
            # IndexError: bert_fuse merges encoder calls, so a per-call
            # index may not exist in the fused program
            print(f"{name:>22}: (not active in this conf)", flush=True)
            continue
        rows.append((name, t))
        print(f"{name:>22}: cum {t*1e3:7.1f} ms  (delta {1e3*(t-prev):+7.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        pack=bool(int(sys.argv[2])) if len(sys.argv) > 2 else True,
        dtype=sys.argv[3] if len(sys.argv) > 3 else "bfloat16",
    )
