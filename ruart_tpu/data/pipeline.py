"""Host data pipeline: dataset -> sampler -> collate -> prefetch -> device.

Replaces the reference's torch DataLoader (+ per-key ``.cuda()`` copies,
`SDNetTrainer.py:100,208-230`) with a thread-pooled item builder and a
double-buffered prefetcher that overlaps host batch assembly and H2D
transfer with device compute — the standard TPU input-pipeline shape.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

from ruart_tpu.data.collate import Collator
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.sampler import VQASampler


def batch_iterator(
    dataset: VQADataset,
    sampler: VQASampler,
    collator: Collator,
    num_workers: int = 0,
):
    """Yield collated numpy batches for each sampler index batch."""
    if num_workers and num_workers > 0:
        pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            for idx_batch in sampler:
                items = list(pool.map(dataset.__getitem__, idx_batch))
                yield collator(items)
        finally:
            pool.shutdown(wait=False)
    else:
        for idx_batch in sampler:
            yield collator([dataset[i] for i in idx_batch])


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


def device_put_batch(batch, sharding=None):
    """Move the array parts of a (q, ocr, od, gt, extra) batch to device;
    ``extra`` (python metadata) stays on host."""
    q, ocr, od, gt, extra = batch
    put = (lambda x: jax.device_put(x, sharding)) if sharding else jax.device_put
    q = {k: put(v) for k, v in q.items()}
    ocr = {k: put(v) for k, v in ocr.items()}
    od = {k: put(v) for k, v in od.items()}
    gt = put(gt) if gt is not None else None
    return q, ocr, od, gt, extra
