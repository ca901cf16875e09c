"""Fixed-shape batch assembly.

Packs ragged per-item features into the [B, N, L] tensors the model
consumes (schema in `ruart_tpu.models.fusion.model`). Semantics follow the
reference collate (`Utils/VQA_Dataset.py:439-517`): zero padding, masks are
id != 0, `num`/`len` carry candidate/word counts. Unlike the reference
(which crashes on over-long items), inputs are truncated to the conf caps.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ruart_tpu.core.config import Config


def _pad_ids(rows: Sequence[Sequence[int]], max_len: int) -> np.ndarray:
    out = np.zeros((len(rows), max_len), dtype=np.int32)
    for i, row in enumerate(rows):
        row = list(row)[:max_len]
        out[i, : len(row)] = row
    return out


def _pad_offsets(
    offset_rows: Sequence[Sequence[Tuple[int, int]]], max_words: int, max_bert: int
) -> np.ndarray:
    out = np.zeros((len(offset_rows), max_words, 2), dtype=np.int32)
    for i, offs in enumerate(offset_rows):
        for j, (st, ed) in enumerate(list(offs)[:max_words]):
            st = min(st, max_bert - 1)
            ed = min(ed, max_bert)
            out[i, j] = (st, max(ed, st))
    return out


class Collator:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.num_scores = cfg.dims.num_scores
        # opt-in BERT candidate dedup: real batches repeat candidate strings
        # heavily (the <OCR> sentinel appears once per question; ES and
        # n-gram sources overlap), and the encoder output depends only on
        # the piece-id row — encode unique rows, gather back on device.
        # bert_dedup_frac caps the unique table at frac * B * N rows
        # (rounded up to 64); batches with more uniques fall back silently.
        self.dedup_frac = float(cfg.opt.get("bert_dedup_frac", 0.0))

    # -- candidate block -------------------------------------------------
    def _collate_items(
        self,
        batch_items: Sequence[Sequence[dict]],
        max_num: int,
        max_len: int,
        max_bert_len: int,
    ) -> Dict[str, np.ndarray]:
        B = len(batch_items)
        keys = batch_items[0][0].keys() if batch_items and batch_items[0] else []
        id_keys = [
            k for k in keys if k in ("glove", "fasttext", "phoc", "pos", "ent")
        ]
        has_bert = "bert" in keys

        out: Dict[str, np.ndarray] = {
            k: np.zeros((B, max_num, max_len), dtype=np.int32) for k in id_keys
        }
        out["position"] = np.zeros((B, max_num, 8), dtype=np.float32)
        out["len"] = np.zeros((B, max_num), dtype=np.int32)
        out["num"] = np.zeros((B,), dtype=np.int32)
        if has_bert:
            out["bert"] = np.zeros((B, max_num, max_bert_len), dtype=np.int32)
            out["bert_offsets"] = np.zeros(
                (B, max_num, max_len, 2), dtype=np.int32
            )

        len_key = "fasttext" if "FastText" in self.cfg.opt else "glove"
        for b, items in enumerate(batch_items):
            items = list(items)[:max_num]
            out["num"][b] = len(items)
            for n, item in enumerate(items):
                for k in id_keys:
                    row = list(item[k])[:max_len]
                    out[k][b, n, : len(row)] = row
                out["position"][b, n] = np.asarray(item["position"], np.float32)
                out["len"][b, n] = min(len(item[len_key]), max_len)
                if has_bert:
                    ids = list(item["bert"])[:max_bert_len]
                    out["bert"][b, n, : len(ids)] = ids
                    out["bert_offsets"][b, n] = _pad_offsets(
                        [item["bert_offsets"]], max_len, max_bert_len
                    )[0]
        if has_bert:
            out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
            if self.dedup_frac > 0:
                self._add_dedup(out, B, max_num, max_bert_len)
        return out

    def _add_dedup(self, out: Dict[str, np.ndarray], B, max_num, max_bert_len):
        """Attach bert_unique [cap, Lb] + bert_inverse [B, N] when the
        batch's unique piece-id rows fit the configured cap."""
        flat = out["bert"].reshape(B * max_num, max_bert_len)
        unique, inverse = np.unique(flat, axis=0, return_inverse=True)
        cap = int(np.ceil(self.dedup_frac * B * max_num / 64.0)) * 64
        cap = max(cap, 64)
        if unique.shape[0] > cap:
            return  # fallback: model uses the dense path
        pad = np.zeros((cap - unique.shape[0], max_bert_len), dtype=np.int32)
        out["bert_unique"] = np.concatenate([unique.astype(np.int32), pad])
        out["bert_inverse"] = inverse.reshape(B, max_num).astype(np.int32)

    # -- question block --------------------------------------------------
    def _collate_q(self, q_list: Sequence[dict]) -> Dict[str, np.ndarray]:
        B = len(q_list)
        Lq, Lqb = self.cfg.max_q_len, self.cfg.max_q_bert_len
        keys = q_list[0].keys()
        out: Dict[str, np.ndarray] = {}
        for k in keys:
            if k == "bert_offsets":
                out[k] = _pad_offsets([q["bert_offsets"] for q in q_list], Lq, Lqb)
            elif k == "bert":
                out[k] = _pad_ids([q[k] for q in q_list], Lqb)
            elif k in ("img_features", "img_spatials"):
                out[k] = np.stack([np.asarray(q[k], np.float32) for q in q_list])
            else:
                out[k] = _pad_ids([q[k] for q in q_list], Lq)
        if "bert" in out:
            out["bert_mask"] = (out["bert"] != 0).astype(np.int32)
        return out

    # -- labels ----------------------------------------------------------
    def _collate_gt(self, gt_list: Sequence[Optional[dict]]) -> Optional[np.ndarray]:
        if not gt_list or gt_list[0] is None:
            return None
        B = len(gt_list)
        out = np.zeros((B, self.num_scores), dtype=np.float32)
        body = self.num_scores - (
            1 if "label_no_answer" in self.cfg.opt else 0
        )
        for b, gt in enumerate(gt_list):
            vals = gt["values"][:body]
            out[b, : len(vals)] = vals
            if gt["no_answer"] is not None:
                out[b, -1] = gt["no_answer"]
        return out

    # -- entry point -----------------------------------------------------
    def __call__(self, batch: Sequence[dict]):
        cfg = self.cfg
        q = self._collate_q([t["q"] for t in batch])
        ocr = self._collate_items(
            [t["ocr"] for t in batch],
            cfg.max_ocr_num, cfg.max_ocr_len, cfg.max_ocr_bert_len,
        )
        od = self._collate_items(
            [t["od"] for t in batch],
            cfg.max_od_num, cfg.max_od_len, cfg.max_od_bert_len,
        )
        gt = self._collate_gt([t["gt"] for t in batch])
        extra = [t["extra_info"] for t in batch]
        return q, ocr, od, gt, extra
