#!/usr/bin/env python
"""Stage decomposition of the flagship forward at bench shapes.

Times the three BERT encoder calls the model makes per batch (OCR unique
table, OD unique table, question) plus the full forward and the training
step, so regressions localize to a stage. Run on the TPU:

    python tools/profile_stages.py [batch_size]

Numbers feed docs/ARCHITECTURE.md "Performance notes".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ruart_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


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


def main(batch_size: int = 64, pack: bool = False):
    from bench import build_flagship
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.bert.model import BertModel

    fn, params, batch = build_flagship(batch_size, dtype="bfloat16", pack=pack)
    q, ocr, od = batch
    t_full = fence_timeit(lambda: fn(params, q, ocr, od))
    print(f"full forward b{batch_size} pack={int(pack)}: {t_full*1e3:.1f} ms "
          f"-> {batch_size/t_full:.1f} q/s")

    # the three encoder calls at their actual (deduped/packed) shapes
    shapes = []
    for name, block, L in (("ocr", ocr, None), ("od", od, None)):
        if "bert_packed" in block:
            rows, width = block["bert_packed"].shape
        elif "bert_unique" in block:
            rows, width = block["bert_unique"].shape
        else:
            rows = block["bert"].shape[0] * block["bert"].shape[1]
            width = block["bert"].shape[-1]
        shapes.append((f"BERT {name}-rows", rows, width))
    shapes.append(("BERT q", q["bert"].shape[0], q["bert"].shape[1]))

    cfg = BertConfig(vocab_size=5000, dtype="bfloat16")
    bert = BertModel(cfg)
    ids0 = jnp.ones((8, 16), jnp.int32)
    bparams = jax.jit(bert.init)(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))
    bf = jax.jit(lambda p, ids, m: bert.apply(p, ids, m))
    bf_seg = jax.jit(
        lambda p, ids, seg, pos: bert.apply(
            p, ids, segment_ids=seg, position_ids=pos
        )
    )
    for name, B, L in shapes:
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 1, 5000)
        if pack and "q" not in name:
            # time the real packed program: block-diagonal segment bias +
            # restarting positions (~13-piece segments, the realistic mean)
            seg_len = 13
            pos = jnp.tile(
                jnp.arange(L, dtype=jnp.int32) % seg_len, (B, 1)
            )
            seg = jnp.tile(
                jnp.arange(L, dtype=jnp.int32) // seg_len + 1, (B, 1)
            )
            t = fence_timeit(bf_seg, bparams, ids, seg, pos)
        else:
            t = fence_timeit(bf, bparams, ids, jnp.ones_like(ids))
        print(f"{name} [{B},{L}]: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 64,
        pack=bool(int(sys.argv[2])) if len(sys.argv) > 2 else False,
    )
