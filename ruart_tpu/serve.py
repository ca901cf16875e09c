"""Online batched inference engine.

The reference only supports file-based offline inference
(`main_test.py` -> msgpack -> submission.json). For serving, this engine
takes raw requests (question text + OCR tokens with pixel boxes + object
detections), runs the full featurization pipeline on host, and answers with
one fixed-shape jitted forward per batch — padding every batch to the
configured batch size so XLA compiles exactly one program.

Request schema (one sample):
    {"question": str,
     "image_width": int, "image_height": int,
     "ocr": [{"word": str, "pos": [8 px quad]}...],
     "od":  [{"object": str, "pos": [cx, cy, w, h] px}...],
     "es":  optional [{"word", "pos", "cnt"}...]}
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ruart_tpu.core.config import Config
from ruart_tpu.data.collate import (
    COMPACT_KEYS,
    DEDUP_KEYS,
    Collator,
    narrow_block,
)
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.preprocess import Preprocessor
from ruart_tpu.eval.decoder import decode_batch
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec
from ruart_tpu.text.wordpiece import WordPieceTokenizer
from ruart_tpu.train.train_step import make_eval_step

_ZERO8 = [0] * 8
_ZERO4 = [0, 0, 0, 0]

# fork-inherited engine for the serving `num_worker` process pool (same
# copy-on-write pattern as data/pipeline.py's trainer pool): set in the
# parent immediately before Pool() forks; workers never touch jax.
_FORK_ENGINE: Optional["InferenceEngine"] = None


def _fork_serve_items(job):
    base, chunk = job
    return _FORK_ENGINE._build_items(chunk, base)


class InferenceEngine:
    def __init__(
        self,
        cfg: Config,
        spec: ModelSpec,
        params,
        vocab: Sequence[str],
        tokenizer: WordPieceTokenizer,
        fixed_answers: Optional[Sequence[str]] = None,
    ):
        self.cfg = cfg
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.fixed_answers = fixed_answers
        self.model = RUArtModel(spec)
        self.collator = Collator(cfg)
        self.eval_step = make_eval_step(self.model)
        self.batch_size = cfg.batch_size
        # the serving host path is allocation-bound: raise GC thresholds
        # (measured 2.6x on featurize; NO_GC_TUNE conf key opts out)
        from ruart_tpu.utils.gctune import tune_gc

        tune_gc(cfg.opt)
        # host featurization reuses the offline pipeline on micro-batches;
        # synthesized gram candidates carry only the keys the runtime
        # dataset reads (the full reference schema is an offline concern)
        self._pre = Preprocessor(cfg)
        self._pre.train_vocab = list(vocab)
        self._pre.gram_word_keys = ("word", "wordid", "pos_id", "ent_id",
                                    "charid")
        self._ocr_name = str(cfg.opt.get("preprocess_ocr_name", "OCR")).split(",")[0]
        self._od_name = str(cfg.opt.get("preprocess_od_name", "OD")).split(",")[0]
        self._es_name = cfg.opt.get("ES_ocr")
        # the reference's `num_worker` key (SDNetTrainer.py:100-106 passes it
        # to the torch DataLoader); here it parallelizes the serving host
        # stage (featurize + item build, ~80% of host time) across a
        # fork-based process pool. 0 = serial (default; wins on few-core
        # hosts — the pool pays off on real multi-core TPU hosts).
        self.num_workers = int(cfg.opt.get("num_worker", 0))
        self._pool = None
        # fork the pool EAGERLY, before this engine starts its device
        # dispatch / prefetch threads: os.fork() from a multithreaded JAX
        # process can deadlock in a worker (JAX warns on it), and the
        # thread population only grows once serving traffic starts. The
        # params may already live on device — that state is copy-on-write
        # and the workers never touch jax — but the fewer live threads at
        # fork time, the safer.
        if self.num_workers > 0:
            self._ensure_pool()
        # H2D slimming (`h2d_slim 1`): drop grid keys the model provably
        # never reads once the packed/unique tables are attached — see
        # collate.slim_block. Applied at device_put time AND to every
        # warmup variant so compiled signatures match live traffic.
        self._h2d_slim = bool(int(cfg.opt.get("h2d_slim", 1)))

    def _slim(self, block):
        from ruart_tpu.data.collate import slim_block

        return slim_block(block) if self._h2d_slim else block

    def _renarrow(self, block):
        """Match warmup-variant dtypes to live traffic: hand-built variant
        keys (int32 zeros/aranges) must narrow exactly like the collator's
        output, or every live batch would miss the warmed signature and pay
        a multi-minute compile. Idempotent; mutates ``block`` in place."""
        coll = self.collator
        if coll.narrow:
            narrow_block(block, coll.narrow_word16, coll.narrow_bert16)
        return block

    # -- host featurization ------------------------------------------------
    def _to_raw_datum(self, sample: Dict[str, Any], qid: int) -> Dict[str, Any]:
        datum = {
            "question": sample["question"],
            "question_id": qid,
            "file_path": sample.get("image_path", ""),
            "image_width": sample.get("image_width", 1),
            "image_height": sample.get("image_height", 1),
            # pos lists are consumed read-only downstream (normalization
            # and od_center_to_quad build fresh lists), so no copies here
            self._ocr_name: [
                {"word": t["word"], "pos": t.get("pos", _ZERO8)}
                for t in sample.get("ocr", [])
            ],
            self._od_name: [
                {"object": t["object"], "pos": t.get("pos", _ZERO4)}
                for t in sample.get("od", [])
            ],
        }
        if self._es_name:
            datum[self._es_name] = [
                {
                    "word": t["word"],
                    "pos": t.get("pos", _ZERO8),
                    "cnt": t.get("cnt", 1),
                    "idx": i,
                }
                for i, t in enumerate(sample.get("es", sample.get("ocr", [])))
            ]
        return datum

    def featurize(self, samples: Sequence[Dict[str, Any]]) -> VQADataset:
        raw = [self._to_raw_datum(s, i) for i, s in enumerate(samples)]
        data = self._pre._process_data(raw)
        self._pre._assign_ids(data)
        return VQADataset(data, self.cfg, mode="test", tokenizer=self.tokenizer)

    def _build_items(self, chunk: Sequence[Dict[str, Any]], base: int = 0):
        """Featurize + build dataset items for ``chunk`` (qids start at
        ``base`` so worker slices keep globally-unique in-batch ids)."""
        raw = [self._to_raw_datum(s, base + i) for i, s in enumerate(chunk)]
        data = self._pre._process_data(raw)
        self._pre._assign_ids(data)
        ds = VQADataset(data, self.cfg, mode="test", tokenizer=self.tokenizer)
        return [ds[i] for i in range(len(ds))]

    def _ensure_pool(self):
        """Lazily fork the serving worker pool. Workers inherit the engine
        (preprocessor, vocab, tokenizer) by copy-on-write and do only
        python/numpy work — featurization is per-sample-independent and
        deterministic, so pooled items are exactly the serial ones
        (parity-pinned in tests/test_serve.py)."""
        import multiprocessing

        if self._pool is not None:
            return self._pool
        if "fork" not in multiprocessing.get_all_start_methods():
            self.num_workers = 0  # no fork (e.g. windows): stay serial
            return None
        global _FORK_ENGINE
        ctx = multiprocessing.get_context("fork")
        # _FORK_ENGINE must stay bound for the POOL'S LIFETIME, not just
        # the initial fork: Pool's maintenance thread re-forks replacement
        # workers whenever one dies, and a respawn under a None global
        # would fail every subsequent pooled batch. Restored in close().
        # (Only one pooled engine per process as a consequence — creating
        # a second replaces the binding, so close() the first one first.)
        _FORK_ENGINE = self
        self._pool = ctx.Pool(processes=self.num_workers)
        return self._pool

    def close(self):
        global _FORK_ENGINE
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
            if _FORK_ENGINE is self:
                _FORK_ENGINE = None

    # the pool holds real worker processes: give callers deterministic
    # release (with-block) plus a best-effort safety net on GC
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- inference -----------------------------------------------------------
    def _collated_batches(self, samples: Sequence[Dict[str, Any]]):
        """Per-device-batch host work: featurize -> dataset items ->
        collate. Yields (first_sample_idx, n_real, batch)."""
        B = self.batch_size
        pool = self._ensure_pool() if self.num_workers > 0 else None
        for start in range(0, len(samples), B):
            chunk = list(samples[start: start + B])
            if pool is not None and len(chunk) > 1:
                n = min(self.num_workers, len(chunk))
                step = -(-len(chunk) // n)
                jobs = [
                    (off, chunk[off: off + step])
                    for off in range(0, len(chunk), step)
                ]
                items = [
                    item for part in pool.map(_fork_serve_items, jobs)
                    for item in part
                ]
            else:
                items = self._build_items(chunk)
            # pad the tail batch by repeating the last item: one compiled shape
            while len(items) < B:
                items.append(items[-1])
            yield start, len(chunk), self.collator(items)

    def predict(self, samples: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Returns [{'answer', 'score', 'idx'}] aligned with samples.

        The host pipeline (featurize -> item build -> collate -> H2D) for
        batch N+1 runs in a prefetch thread while the device executes batch
        N and this thread decodes batch N-1 — the device never waits on
        host featurization unless the host is strictly slower end-to-end.
        """
        from ruart_tpu.data.pipeline import prefetch

        results: List[Dict[str, Any]] = [None] * len(samples)

        def put(t):
            start, n_real, (q, ocr, od, gt, extra) = t
            from ruart_tpu.data.pipeline import put_block

            q = put_block(q, slim=self._h2d_slim)
            ocr = put_block(ocr, slim=self._h2d_slim)
            od = put_block(od, slim=self._h2d_slim)
            return start, n_real, (q, ocr, od, gt, extra)

        def drain(pending):
            start, n_real, scores, num, extra = pending
            res, save_res, _, _ = decode_batch(
                np.asarray(scores), extra, np.asarray(num),
                self.fixed_answers,
                yesno=self.spec.label_yesno,
                label_no_answer=self.spec.label_no_answer,
            )
            for j in range(n_real):
                results[start + j] = {
                    "answer": save_res[j]["prediction"],
                    "score": save_res[j]["score"],
                    "idx": save_res[j]["idx"],
                }

        # software pipeline (same as eval.evaluator): dispatch batch N+1
        # before fetching/decoding batch N so the device never idles
        # through the fetch RTT + decode
        it = self._collated_batches(samples)
        pending = None
        for start, n_real, (q, ocr, od, gt, extra) in prefetch(
            it, size=2, device_put=put
        ):
            scores, _ = self.eval_step(self.params, q, ocr, od, None)
            if pending is not None:
                drain(pending)
            pending = (start, n_real, scores, ocr["num"], extra)
        if pending is not None:
            drain(pending)
        return results

    # -- staged single-wave API (BatchingServer's two-stage pipeline) -----
    def prepare(self, samples: Sequence[Dict[str, Any]]):
        """Host stage for one wave (<= batch_size samples): featurize ->
        item build -> collate -> H2D. Returns an opaque prepared wave."""
        import jax

        _, n_real, (q, ocr, od, _gt, extra) = next(
            self._collated_batches(samples)
        )
        from ruart_tpu.data.pipeline import put_block

        q = put_block(q, slim=self._h2d_slim)
        ocr = put_block(ocr, slim=self._h2d_slim)
        od = put_block(od, slim=self._h2d_slim)
        return n_real, q, ocr, od, extra

    def dispatch(self, prepared):
        """Device stage: enqueue the jitted step (async dispatch — errors
        surface at the fetch inside :meth:`decode_pending`). Returns a
        pending handle."""
        n_real, q, ocr, od, extra = prepared
        scores, _ = self.eval_step(self.params, q, ocr, od, None)
        return scores, ocr["num"], extra, n_real

    def decode_pending(self, pending) -> List[Dict[str, Any]]:
        """Drain stage: fetch scores and decode the wave's real rows."""
        scores, num, extra, n_real = pending
        _res, save_res, _, _ = decode_batch(
            np.asarray(scores), extra, np.asarray(num),
            self.fixed_answers,
            yesno=self.spec.label_yesno,
            label_no_answer=self.spec.label_no_answer,
        )
        return [
            {
                "answer": save_res[j]["prediction"],
                "score": save_res[j]["score"],
                "idx": save_res[j]["idx"],
            }
            for j in range(n_real)
        ]

    # -- production knobs -------------------------------------------------
    def quantize(self) -> "InferenceEngine":
        """Switch to the weight-only-int8 encoder (the INT8_BERT serving
        mode): quantizes the current params and swaps the eval program.
        Returns self for chaining."""
        import dataclasses

        from ruart_tpu.ops.quant import quantize_bert_params

        if self.spec.bert is None or self.spec.bert.quant == "int8":
            return self
        self.spec = dataclasses.replace(
            self.spec, bert=dataclasses.replace(self.spec.bert, quant="int8")
        )
        self.model = RUArtModel(self.spec)
        self.eval_step = make_eval_step(self.model)
        self.params = quantize_bert_params(self.params)
        return self

    def warmup(self, max_programs: Optional[int] = None) -> int:
        """Precompile every batch signature the collator can emit — the
        (OCR num/len bucket) x (q-BERT width) x (OCR/OD word width) x
        (OCR dedup (rows, len) or dense) x (OD dedup (rows, len) or dense)
        x (OCR/OD cand_sel length or dense grid)
        product — so no live request ever pays a compile. The full cross
        product matters: each block independently falls back to dense when
        its uniques overflow its cap, and every bucket axis varies per
        batch. The product is bounded by the conf ladders (and the
        cand_sel axis is pruned to the lengths actually reachable in each
        num bucket) but still multiplies quickly; ``max_programs``
        truncates it (logged — later signatures then compile lazily,
        amortized by the persistent compile cache). PREFER
        :meth:`warmup_calibrated` with a sample of real traffic — it warms
        exactly the observed signatures plus every fallback variant, and
        is the recommended mode for production. Returns the number of
        programs compiled."""
        import itertools
        import logging

        from ruart_tpu.data.synthetic import make_synthetic_batch

        log = logging.getLogger(__name__)
        coll, cfg = self.collator, self.cfg
        count = 0
        B = self.batch_size

        def dedup_opts(max_num: int, bert_len: int):
            if coll.pack:
                # packed mode: (rows, lsz, packed-row) triples — the R axis
                # multiplies the product; max_programs / warmup_calibrated
                # are the pressure valves
                return (None,) + tuple(
                    (rows, lsz, R)
                    for rows in coll.dedup_sizes(B, max_num)
                    for lsz in coll.dedup_len_ladder(bert_len)
                    for R in coll.pack_row_ladder(rows)
                )
            return (None,) + tuple(
                (rows, lsz)
                for rows in coll.dedup_sizes(B, max_num)
                for lsz in coll.dedup_len_ladder(bert_len)
            )

        shape_axes = list(itertools.product(
            coll.ocr_num_buckets, coll.ocr_len_buckets, coll.q_bert_buckets,
            coll.ocr_word_buckets, coll.od_word_buckets,
        ))
        for n_bucket, l_bucket, q_len, ocr_w, od_w in shape_axes:
            q, ocr, od, _ = make_synthetic_batch(
                self.spec, cfg, B, seed=0,
                ocr_num=n_bucket, ocr_bert_len=l_bucket, q_bert_len=q_len,
                ocr_word_len=ocr_w, od_word_len=od_w,
            )
            # q_pack: live q blocks ALWAYS carry the packed table (frac
            # 1.0 never falls back), so warm the as-collated signature;
            # bucket drift within the q ladders is covered by
            # warmup_calibrated's q-top variant / lazy compile
            if coll.q_pack and coll.pack and coll.dedup_frac > 0:
                coll._add_dedup(q, B, 1, q["bert"].shape[-1], frac=1.0)
                if "bert_inverse" in q:
                    q["bert_inverse"] = q["bert_inverse"].reshape(B)
            ocr_opts = dedup_opts(n_bucket, l_bucket)
            od_opts = dedup_opts(od["bert"].shape[1], od["bert"].shape[2])

            # candidate-compaction axis: None (dense grid) plus the
            # cand_sel ladder lengths REACHABLE in this num bucket — every
            # sample contributes >= 1 real row (the sentinel candidate) and
            # at least one sample's count exceeds the previous num bucket
            # (else the collator would have picked that bucket), so real
            # rows >= B + prev_bucket and smaller ladder entries can never
            # be chosen (cand_sel pads to the smallest entry >= real rows)
            def plausible_sels(nb: int, buckets) -> tuple:
                prev = max((x for x in buckets if x < nb), default=0)
                r_min = B + prev
                return (None,) + tuple(
                    s for s in coll.compact_sizes(B, nb) if s >= r_min
                )

            ocr_sels = plausible_sels(n_bucket, coll.ocr_num_buckets)
            od_n = od["bert"].shape[1]
            od_sels = plausible_sels(od_n, (od_n,))
            for opt_ocr, opt_od, sel_ocr, sel_od in itertools.product(
                ocr_opts, od_opts, ocr_sels, od_sels
            ):
                if max_programs is not None and count >= max_programs:
                    log.warning(
                        "warmup stopped at max_programs=%d; remaining "
                        "signatures compile lazily on first use",
                        max_programs,
                    )
                    return count
                ocr_v, od_v = dict(ocr), dict(od)
                for block, opt_rl, n_sel in (
                    (ocr_v, opt_ocr, sel_ocr), (od_v, opt_od, sel_od)
                ):
                    for k in DEDUP_KEYS + COMPACT_KEYS:
                        block.pop(k, None)
                    if n_sel is not None:
                        # only the length matters to the compile; real
                        # in-range indices keep the scatter well-formed
                        Bb, N = block["num"].shape[0], block["bert"].shape[1]
                        block["cand_sel"] = (
                            np.arange(n_sel, dtype=np.int32) % (Bb * N)
                        )
                    if opt_rl is None:
                        continue
                    size, lsz = opt_rl[:2]
                    Bb, N, Lb = block["bert"].shape
                    block["bert_inverse"] = np.zeros((Bb, N), np.int32)
                    # the collator's joint (pieces, offsets) dedup key emits
                    # per-unique word spans; real batches always carry this
                    # key alongside the table, so the compiled signature
                    # must too (zeros: only shapes matter to the compile)
                    W = block["bert_offsets"].shape[2]
                    block["bert_unique_offsets"] = np.zeros(
                        (size, W, 2), np.int32
                    )
                    if len(opt_rl) == 3:
                        # packed signature: only shapes matter to the
                        # compile; one max-width segment per row
                        R = opt_rl[2]
                        Lp = max(coll.pack_len, lsz)
                        seg = np.zeros((R, Lp), np.int32)
                        pos = np.zeros((R, Lp), np.int32)
                        seg[:, :lsz] = 1
                        pos[:, :lsz] = np.arange(lsz)
                        block["bert_packed"] = seg.copy()  # token id 1
                        block["bert_packed_seg"] = seg
                        block["bert_packed_pos"] = pos
                        block["bert_unpack"] = np.zeros((size, lsz), np.int32)
                        continue
                    uniq = block["bert"].reshape(Bb * N, Lb)[:size, :lsz]
                    if uniq.shape[0] < size:
                        uniq = np.concatenate([
                            uniq,
                            np.zeros((size - uniq.shape[0], lsz), np.int32),
                        ])
                    block["bert_unique"] = uniq.astype(np.int32)
                self.eval_step(
                    self.params, self._slim(self._renarrow(q)),
                    self._slim(self._renarrow(ocr_v)),
                    self._slim(self._renarrow(od_v)), None,
                )
                count += 1
        return count

    def _q_top_tables(self, q: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """The q block rebuilt with its packed tables at the TOP ladder
        buckets (size = cap, lsz = widest, R = row-ladder top) — the
        worst-case q_pack signature a live batch can produce. Only shapes
        matter to the compile. None when q packing is off."""
        coll = self.collator
        if not (coll.q_pack and coll.pack and coll.dedup_frac > 0):
            return None
        B, Lqb = q["bert"].shape
        size = coll.dedup_cap(B, 1, 1.0)
        lsz = coll.dedup_len_ladder(Lqb)[-1]
        R = coll.pack_row_ladder(size)[-1]
        Lp = max(coll.pack_len, lsz)
        out = {
            k: v for k, v in q.items()
            if k not in DEDUP_KEYS
        }
        seg = np.zeros((R, Lp), np.int32)
        pos = np.zeros((R, Lp), np.int32)
        seg[:, :lsz] = 1
        pos[:, :lsz] = np.arange(lsz)
        out["bert_packed"] = seg.copy()  # token id 1 where seg == 1
        out["bert_packed_seg"] = seg
        out["bert_packed_pos"] = pos
        out["bert_unpack"] = np.zeros((size, lsz), np.int32)
        W = q["bert_offsets"].shape[1]
        out["bert_unique_offsets"] = np.zeros((size, W, 2), np.int32)
        out["bert_inverse"] = np.zeros((B,), np.int32)
        return out

    def warmup_calibrated(self, samples: Sequence[Dict[str, Any]]) -> int:
        """Precompile exactly the signatures a calibration sample of real
        traffic produces, plus every fallback a live batch can land on:
        the dedup-stripped, compaction-stripped, and both-stripped variants
        of each observed signature (a live batch that overflows the dedup
        cap or the top cand_sel ladder bucket drops those keys — without
        these a single hot request pays a multi-minute live compile), and
        the next-larger cand_sel bucket (a slightly fuller batch shifts
        buckets). This is the RECOMMENDED warmup mode; the full
        :meth:`warmup` cross product multiplies with every ladder axis.
        Returns programs compiled."""
        from ruart_tpu.data.synthetic import make_synthetic_batch

        seen = set()
        count = 0

        def run(qq, oo, dd):
            nonlocal count
            # variants are built on FULL host dicts; narrow + slim exactly
            # like the live collate/device_put path so the compiled
            # signature (dtypes included) matches
            qq, oo, dd = (
                self._slim(self._renarrow(dict(t))) for t in (qq, oo, dd)
            )
            sig = tuple(
                (k, v.shape)
                for t in (qq, oo, dd)
                for k, v in sorted(t.items())
            )
            if sig in seen:
                return
            seen.add(sig)
            self.eval_step(self.params, qq, oo, dd, None)
            count += 1

        def strip(block, keys):
            return {k: v for k, v in block.items() if k not in keys}

        def bump_sel(block):
            """The block with cand_sel padded to the next-larger ladder
            bucket (None when absent or already at the top)."""
            if "cand_sel" not in block:
                return None
            B, N = block["bert"].shape[:2]
            bigger = [
                s for s in self.collator.compact_sizes(B, N)
                if s > block["cand_sel"].shape[0]
            ]
            if not bigger:
                return None
            out = dict(block)
            sel = np.full(bigger[0], B * N, np.int32)
            sel[: block["cand_sel"].shape[0]] = np.asarray(block["cand_sel"])
            out["cand_sel"] = sel
            return out

        for _, _, (q, ocr, od, _gt, _extra) in self._collated_batches(samples):
            for ks in ((), DEDUP_KEYS, COMPACT_KEYS, DEDUP_KEYS + COMPACT_KEYS):
                oo, dd = strip(ocr, ks), strip(od, ks)
                run(q, oo, dd)
                bo, bd = bump_sel(oo), bump_sel(dd)
                if bo is not None or bd is not None:
                    run(q, bo if bo is not None else oo,
                        bd if bd is not None else dd)
            # q_pack bucket drift: a fuller question batch shifts the q
            # tables' size/lsz/R buckets — warm the worst-case (top-bucket)
            # q signature against this batch's typical ocr/od blocks
            qt = self._q_top_tables(q)
            if qt is not None:
                run(qt, ocr, od)
        # the panic program: conf caps, dense candidate grid, no
        # dedup/compaction (an overflow on every axis at once lands here).
        # q keeps its top-bucket packed tables when q_pack is on — live q
        # blocks always carry the table (frac 1.0 never falls back), so a
        # dense-q panic program would never be hit
        q, ocr, od, _ = make_synthetic_batch(
            self.spec, self.cfg, self.batch_size, seed=0
        )
        for block in (ocr, od):
            for k in DEDUP_KEYS + COMPACT_KEYS:
                block.pop(k, None)
        run(self._q_top_tables(q) or q, ocr, od)
        return count

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_trainer(cls, trainer) -> "InferenceEngine":
        return cls(
            trainer.cfg, trainer.spec, trainer.state.params,
            getattr(trainer, "vocab", trainer.preproc.train_vocab or []),
            trainer.tokenizer, trainer.fixed_answers,
        )


class BatchingServer:
    """Dynamic micro-batching front end over :class:`InferenceEngine`.

    Online callers submit ONE request at a time; the TPU wants full
    fixed-shape batches. A background worker drains the request queue into
    batches of up to ``engine.batch_size``, dispatching early after
    ``max_wait_ms`` so a lone request is never stuck waiting for
    neighbors — the standard latency/throughput knob of a serving
    front end (no reference equivalent: `main_test.py` is offline-only).

    ``submit`` returns a ``concurrent.futures.Future`` resolving to the
    engine's ``{'answer', 'score', 'idx'}`` dict; ``predict_one`` is the
    blocking convenience wrapper. Thread-safe; call ``close()`` (or use as
    a context manager) to drain and stop the worker.
    """

    def __init__(self, engine: InferenceEngine, max_wait_ms: float = 10.0):
        import queue
        import threading

        self.engine = engine
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._lat_lock = threading.Lock()
        self._latencies_s: List[float] = []
        self._batch_sizes: List[int] = []
        # two-stage pipeline: the gather thread forms waves and runs the
        # HOST stage (featurize/collate/H2D) while the device thread runs
        # the jitted step + decode — under continuous traffic wave K+1's
        # host work overlaps wave K's device step (throughput ~= the
        # slower stage instead of their sum). The bounded queue caps
        # in-flight host work (backpressure).
        self._prep_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._gather = threading.Thread(target=self._gather_loop, daemon=True)
        self._device = threading.Thread(target=self._device_loop, daemon=True)
        self._gather.start()
        self._device.start()

    # -- client side -----------------------------------------------------
    def submit(self, sample: Dict[str, Any]):
        from concurrent.futures import Future

        if self._stop.is_set():
            raise RuntimeError("BatchingServer is closed")
        import time

        fut: Future = Future()
        self._q.put((sample, fut, time.monotonic()))
        return fut

    def predict_one(self, sample: Dict[str, Any], timeout: Optional[float] = None):
        return self.submit(sample).result(timeout)

    # -- workers ----------------------------------------------------------
    def _gather_loop(self):
        """Form waves from the request queue and run the HOST stage."""
        import queue
        import time

        B = self.engine.batch_size
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set():
                    self._prep_q.put(None)  # sentinel: no more waves
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < B:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                prepared = self.engine.prepare([s for s, _, _ in batch])
            except BaseException as e:
                self._fail(batch, e)
                continue
            self._prep_q.put((prepared, batch))

    def _device_loop(self):
        """Dispatch prepared waves; under back-to-back traffic wave K is
        drained only after wave K+1 is dispatched (device never idles
        through the fetch), but an idle queue drains immediately so a lone
        request is never held hostage to traffic that may not come."""
        import queue

        pending = None
        while True:
            if pending is not None:
                try:
                    item = self._prep_q.get_nowait()
                except queue.Empty:
                    self._drain(*pending)
                    pending = None
                    continue
            else:
                item = self._prep_q.get()
            if item is None:
                if pending is not None:
                    self._drain(*pending)
                return
            prepared, batch = item
            try:
                handle = self.engine.dispatch(prepared)
            except BaseException as e:
                self._fail(batch, e)
                handle = None
            if pending is not None:
                self._drain(*pending)
            pending = (handle, batch) if handle is not None else None

    def _drain(self, handle, batch):
        import time

        try:
            results = self.engine.decode_pending(handle)
        except BaseException as e:
            self._fail(batch, e)
            return
        done = time.monotonic()
        with self._lat_lock:
            self._batch_sizes.append(len(batch))
            self._latencies_s.extend(done - t0 for _, _, t0 in batch)
        for (_, fut, _), res in zip(batch, results):
            if not fut.cancelled():
                fut.set_result(res)

    @staticmethod
    def _fail(batch, exc):
        for _, fut, _ in batch:
            if not fut.cancelled():
                fut.set_exception(exc)

    # -- observability ---------------------------------------------------
    def stats(self) -> Dict[str, float]:
        """Request-latency percentiles (submit -> result, seconds) and
        batch-fill stats since startup. Empty dict before any batch."""
        with self._lat_lock:
            lats = np.asarray(self._latencies_s, dtype=np.float64)
            fills = np.asarray(self._batch_sizes, dtype=np.float64)
        if lats.size == 0:
            return {}
        return {
            "requests": int(lats.size),
            "batches": int(fills.size),
            "latency_p50_ms": float(np.percentile(lats, 50) * 1e3),
            "latency_p99_ms": float(np.percentile(lats, 99) * 1e3),
            "latency_max_ms": float(lats.max() * 1e3),
            "mean_batch_fill": float(fills.mean() / self.engine.batch_size),
        }

    # -- lifecycle -------------------------------------------------------
    def close(self, timeout: float = 30.0):
        """Stop accepting work, drain in-flight requests, join workers."""
        self._stop.set()
        self._gather.join(timeout)
        self._device.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
