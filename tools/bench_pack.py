#!/usr/bin/env python
"""A/B the sequence-packed BERT candidate table (`bert_pack 1`) against the
plain dedup table on the flagship forward at bench shapes.

The packed table cuts encoder rows/tokens ~3-4x at realistic duplication
(OCR uniques 3200x30 -> 800x32 at batch 256), and BERT-on-uniques is the
majority of the device batch — this harness measures what that buys
end-to-end on the device. Run on the TPU:

    python tools/bench_pack.py [batch] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ruart_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def fence_timeit(f, *a, iters=10, warmup=2):
    for _ in range(warmup):
        o = f(*a)
    np.asarray(o.ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(o.ravel()[:4])
    return (time.perf_counter() - t0) / iters


def build(batch_size: int, dtype: str, pack: bool):
    import jax
    import jax.numpy as jnp

    from bench import _add_realistic_duplication
    from ruart_tpu.core.presets import stvqa_config
    from ruart_tpu.data.collate import Collator
    from ruart_tpu.data.synthetic import make_synthetic_batch
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec

    cfg = stvqa_config(vocab_size=5000, batch_size=batch_size)
    # collator packs by default: set the key both ways so dense is dense
    cfg.opt["bert_pack"] = 1 if pack else 0
    spec = ModelSpec.from_config(cfg, BertConfig(dtype=dtype))
    model = RUArtModel(spec)
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, batch_size, seed=0)
    _add_realistic_duplication(ocr, 0.125, seed=1)
    _add_realistic_duplication(od, 0.03, seed=2)
    coll = Collator(cfg)
    for block in (ocr, od):
        B, N, Lb = block["bert"].shape
        coll._add_dedup(block, B, N, Lb)
    q, ocr, od = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), q, ocr, od)

    fn = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True)
    )
    return fn, params, (q, ocr, od)


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    print(f"devices={jax.devices()} batch={batch} dtype={dtype}")
    results = {}
    outs = {}
    for pack in (False, True):
        fn, params, (q, ocr, od) = build(batch, dtype, pack)
        keyshapes = {
            k: v.shape for k, v in ocr.items() if k.startswith("bert_")
        }
        dt = fence_timeit(fn, params, q, ocr, od)
        results[pack] = dt
        outs[pack] = np.asarray(fn(params, q, ocr, od), np.float32)
        print(
            f"pack={int(pack)}: {dt * 1e3:8.2f} ms/batch  "
            f"{batch / dt:7.1f} q/s  ocr={keyshapes}"
        )
    diff = np.abs(outs[True] - outs[False]).max()
    print(f"speedup {results[False] / results[True]:.3f}x  max|diff|={diff:.2e}")


if __name__ == "__main__":
    main()
