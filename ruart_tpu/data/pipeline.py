"""Host data pipeline: dataset -> sampler -> collate -> prefetch -> device.

Replaces the reference's torch DataLoader (+ per-key ``.cuda()`` copies,
`SDNetTrainer.py:100,208-230`) with a thread-pooled item builder and a
double-buffered prefetcher that overlaps host batch assembly and H2D
transfer with device compute — the standard TPU input-pipeline shape.
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

from ruart_tpu.data.collate import Collator
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.sampler import VQASampler

# fork-inherited dataset for the `num_worker` process pool: set in the
# parent immediately before Pool() forks, so workers get the dataset by
# copy-on-write page sharing instead of a pickled copy each (the reference's
# torch DataLoader workers do the same, `SDNetTrainer.py:100-106`).
_FORK_DATASET: Optional[VQADataset] = None


def _fork_build_items(idx_chunk):
    ds = _FORK_DATASET
    return [ds[i] for i in idx_chunk]


def _chunk(seq, n: int):
    """Split ``seq`` into <= n contiguous chunks of near-equal size."""
    seq = list(seq)
    n = max(1, min(n, len(seq)))
    step = -(-len(seq) // n)
    return [seq[i: i + step] for i in range(0, len(seq), step)]


def batch_iterator(
    dataset: VQADataset,
    sampler: VQASampler,
    collator: Collator,
    num_workers: int = 0,
):
    """Yield collated numpy batches for each sampler index batch.

    ``num_workers > 0`` (the reference's ``num_worker`` conf key) builds
    items in a fork-based PROCESS pool with one-batch lookahead — batch
    k+1's items build in the workers while the parent collates batch k and
    the device runs. Item building is pure python/numpy over preprocessed
    data (deterministic, side-effect-free aside from value-transparent
    caches), so worker-built items are exactly the serial ones
    (parity-pinned in tests/test_data.py). Falls back to an in-process
    thread pool when fork is unavailable."""
    if not num_workers or num_workers <= 0:
        for idx_batch in sampler:
            yield collator([dataset[i] for i in idx_batch])
        return

    if "fork" not in multiprocessing.get_all_start_methods():
        pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            for idx_batch in sampler:
                items = list(pool.map(dataset.__getitem__, idx_batch))
                yield collator(items)
        finally:
            pool.shutdown(wait=False)
        return

    global _FORK_DATASET
    ctx = multiprocessing.get_context("fork")
    prev, _FORK_DATASET = _FORK_DATASET, dataset
    pool = ctx.Pool(processes=num_workers)
    _FORK_DATASET = prev  # workers already forked with the dataset
    try:
        it = iter(sampler)
        nxt = next(it, None)
        pending = (
            pool.map_async(_fork_build_items, _chunk(nxt, num_workers))
            if nxt is not None else None
        )
        while pending is not None:
            chunks = pending.get()
            nxt = next(it, None)
            pending = (
                pool.map_async(_fork_build_items, _chunk(nxt, num_workers))
                if nxt is not None else None
            )
            yield collator([item for part in chunks for item in part])
    finally:
        pool.terminate()
        pool.join()


def prefetch(
    iterator: Iterable,
    size: int = 2,
    device_put: Optional[Callable[[Any], Any]] = None,
) -> Iterator:
    """Background-thread prefetch with bounded queue; optionally moves each
    element to device (jax.device_put / sharded put) while the consumer is
    still busy with the previous batch."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                if device_put is not None:
                    item = device_put(item)
                q.put(item)
        except BaseException as e:  # surfaced in the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


# keys that routinely carry the SAME word-id grid (the dataset emits one
# underlying id list under several embedding keys); ship one buffer and
# reuse the device array — exact, and neither step donates batch buffers
_ALIAS_KEYS = ("glove", "fasttext", "phoc")


def put_block(block, put=None, slim=True):
    """device_put one q/ocr/od dict. ``slim`` drops provably-dead grid keys
    (collate.slim_block); aliased ``glove``/``fasttext``/``phoc`` grids
    transfer ONCE — together ~4x fewer flagship H2D bytes, which dominates
    the end-to-end step under the axon tunnel (~120 MB/s) and is still
    PCIe traffic on real hosts.

    Aliases are detected by IDENTITY: the collator emits the shared grid
    as literally the same ndarray object under each key (collate's
    identity-probe pack), so `is` is both sufficient and free. A full
    byte-equality fallback would burn host CPU on every multi-MB grid in
    the hot prefetch path exactly when the arrays are distinct; it is
    kept only behind RUART_VERIFY_ALIASES=1 for debugging collators that
    copy instead of alias."""
    import numpy as np

    from ruart_tpu.data.collate import slim_block

    verify = os.environ.get("RUART_VERIFY_ALIASES") == "1"
    if put is None:
        put = jax.device_put
    if slim:
        block = slim_block(block)
    out = {}
    seen = []  # (host_array, device_array) for _ALIAS_KEYS
    for k, v in block.items():
        if k in _ALIAS_KEYS:
            hit = None
            for v2, d2 in seen:
                if v is v2 or (
                    verify
                    and isinstance(v, np.ndarray) and isinstance(v2, np.ndarray)
                    and v.shape == v2.shape and v.dtype == v2.dtype
                    and np.array_equal(v, v2)
                ):
                    hit = d2
                    break
            if hit is None:
                hit = put(v)
                seen.append((v, hit))
            out[k] = hit
        else:
            out[k] = put(v)
    return out


def device_put_batch(batch, sharding=None, slim=True):
    """Move the array parts of a (q, ocr, od, gt, extra) batch to device;
    ``extra`` (python metadata) stays on host. ``slim`` (default on, conf
    ``h2d_slim 0`` opts out at the call sites) drops grid keys the model
    provably never reads when the dedup/packed tables are attached and
    ships duplicated id grids once — see :func:`put_block`."""
    q, ocr, od, gt, extra = batch
    put = (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
    q = put_block(q, put, slim)
    ocr = put_block(ocr, put, slim)
    od = put_block(od, put, slim)
    gt = put(gt) if gt is not None else None
    return q, ocr, od, gt, extra
