#!/usr/bin/env python
"""Host->device transfer cost of one flagship collated batch, full vs
slimmed (`h2d_slim`, collate.slim_block + pipeline.put_block aliasing).

Under the axon tunnel (~120 MB/s) the H2D of a ~25 MB batch dominates the
end-to-end step; this tool attributes the bytes per key and measures the
put wall time both ways.

    python tools/profile_h2d.py [batch_size] [n_items]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ruart_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def nbytes(t):
    return sum(v.nbytes for v in t.values())


def main(bs=256, n=256):
    from bench import build_corpus_model
    from ruart_tpu.data.pipeline import device_put_batch

    cfg, ds, tok, pre, spec, model, coll, params = build_corpus_model(
        bs, "bfloat16", n, pack=True)
    batch = coll([ds[i % len(ds)] for i in range(bs)])
    q, ocr, od, gt, extra = batch

    for name, t in (("q", q), ("ocr", ocr), ("od", od)):
        print(f"{name}: {nbytes(t)/1e6:.2f} MB")
        for k, v in sorted(t.items(), key=lambda kv: -kv[1].nbytes):
            if v.nbytes > 100_000:
                print(f"    {k:>22} {str(v.shape):>18} {v.dtype} "
                      f"{v.nbytes/1e6:6.2f} MB")

    def timed(slim):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = device_put_batch(batch, slim=slim)
            # fence: fetch a few bytes from every leaf's buffer
            for t in out[:3]:
                for v in t.values():
                    np.asarray(v.ravel()[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_full = timed(slim=False)
    t_slim = timed(slim=True)
    sq, socr, sod, _, _ = device_put_batch(batch, slim=True)
    seen, shipped = set(), 0
    for t in (sq, socr, sod):
        for v in t.values():
            if id(v) not in seen:
                seen.add(id(v))
                shipped += v.nbytes
    total = nbytes(q) + nbytes(ocr) + nbytes(od)
    print(f"\nfull  put: {t_full*1e3:8.1f} ms  ({total/1e6:.2f} MB)")
    print(f"slim  put: {t_slim*1e3:8.1f} ms  (~{shipped/1e6:.2f} MB shipped)")
    print(f"speedup: {t_full/t_slim:.3f}x  bytes: {total/max(shipped,1):.2f}x")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        int(sys.argv[2]) if len(sys.argv) > 2 else 256,
    )
