"""RUArt fusion network — the full forward pass as ONE jitted program.

TPU-native re-design of the reference model graph (`Models/SDNet.py:253-437`)
with identical math on the shipped-conf path but zero host-side Python in the
hot loop:

* candidates live in fixed-shape [B, N, L] tensors; the reference's ragged
  scatter loops (`SDNet.py:298-318,495-551`) become reshapes, a batched
  last-state gather, and a candidate mask;
* the word-level pre-alignment runs directly on [B, N*L] tokens — each
  token's attended vector depends only on the question, so the ragged
  packing in `SDNet.get_prealign_emb` is unnecessary (padded tokens are
  masked to zero afterwards, matching the reference's zero-filled buffers);
* all three BERT calls (question / OCR / OD) run through one shared encoder
  submodule on flattened [B*N, Lb] batches — the FLOP-dominant stage
  (SURVEY §3.5), MXU-batched;
* the 12-layer α-combine happens BEFORE subword pooling (linear ops
  commute; 12x less pooling work).

Batch schema (all int32 unless noted; PAD id 0; masks derived as id != 0,
matching `VQA_Dataset.py:502-516`):

question dict ``q``:
  glove/fasttext/phoc [B, Lq], pos [B, Lq], ent [B, Lq],
  bert [B, Lqb], bert_mask [B, Lqb], bert_offsets [B, Lq, 2],
  img_features [B, F, img_fea_dim] f32 (optional), img_spatials [B, F, 8] f32

candidate dicts ``ocr`` / ``od``:
  fasttext/glove/phoc [B, N, L], pos [B, N, L], ent [B, N, L],
  bert [B, N, Lb], bert_mask [B, N, Lb], bert_offsets [B, N, L, 2],
  position [B, N, 8] f32, len [B, N] (words per candidate),
  num [B] (real candidates incl. the <OCR>/<OD> sentinel)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ruart_tpu.models.bert.model import BertModel, subword_to_word_pooling
from ruart_tpu.models.fusion.deep_attention import DeepAttention
from ruart_tpu.models.fusion.layers import (
    Attention,
    GetFinalScores,
    LinearSelfAttn,
    dropout_fn,
    weighted_avg,
)
from ruart_tpu.models.fusion.rnn import StackedBRNN, gather_last_state
from ruart_tpu.models.fusion.spec import ModelSpec


def _flatten_cand(x: jax.Array) -> jax.Array:
    """[B, N, ...] -> [B*N, ...]"""
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


def _widen_ints(item: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Restore int32 for wire-narrowed integer arrays (`h2d_narrow`).

    The collator ships id grids / offsets / gather indices as int8/int16
    to cut H2D bytes (collate.narrow_block); on device the cast back is
    free (fused into the first consumer). Values are exact — narrowing is
    gated on static bounds host-side."""
    return {
        k: (
            v.astype(jnp.int32)
            if v.dtype.kind in "iu" and v.dtype.itemsize < 4
            else v
        )
        for k, v in item.items()
    }


class RUArtModel(nn.Module):
    spec: ModelSpec

    def setup(self):
        s = self.spec
        if s.use_glove:
            self.glove_embed = nn.Embed(s.vocab_size, s.glove_dim)
        if s.use_fasttext:
            self.fast_embed = nn.Embed(s.vocab_size, s.fast_dim)
        if s.use_phoc:
            self.phoc_embed = nn.Embed(s.vocab_size, s.phoc_dim)
        needs_pos = "pos" in s.q_embedding or "pos" in s.ocr_embedding
        needs_ent = "ent" in s.q_embedding or "ent" in s.ocr_embedding
        if needs_pos:
            self.pos_embedding = nn.Embed(s.pos_vocab, s.pos_dim)
        if needs_ent:
            self.ent_embedding = nn.Embed(s.ent_vocab, s.ent_dim)

        if s.use_bert:
            self.Bert = BertModel(s.bert)
            if s.bert_linear_combine:
                self.alphaBERT = self.param(
                    "alphaBERT", lambda k: jnp.ones((s.bert.num_hidden_layers,))
                )
                self.gammaBERT = self.param("gammaBERT", lambda k: jnp.ones((1, 1)))

        if s.pre_align:
            self.pre_align = Attention(
                s.prealign_hidden, correlation_func=3, do_similarity=True,
                dropout_p=s.dropout_p, variational=s.variational,
            )

        self.multi2one = StackedBRNN(
            s.multi2one_hidden_size, num_layers=1,
            bidirectional=s.multi2one_bidir,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        self.context_rnn = StackedBRNN(
            s.hidden_size, num_layers=s.in_rnn_layers,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        self.ques_rnn = StackedBRNN(
            s.hidden_size, num_layers=s.in_rnn_layers,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        self.deep_attn = DeepAttention(
            abstr_list_cnt=s.in_rnn_layers,
            deep_att_hidden_size_per_abstr=s.deep_att_hidden_size_per_abstr,
            highlvl_hidden_size=s.highlvl_hidden_size,
            correlation_func=3,
            no_deep_attention=s.no_deep_attention,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        self.high_lvl_ques_rnn = StackedBRNN(
            s.highlvl_hidden_size,
            num_layers=s.question_high_lvl_rnn_layers,
            concat_layers=True,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        deep_out = s.highlvl_hidden_size * 2
        if not s.no_context_self_attention:
            self.highlvl_self_att = Attention(
                s.deep_att_hidden_size_per_abstr, correlation_func=3,
                dropout_p=s.dropout_p, variational=s.variational,
            )
        self.high_lvl_context_rnn = StackedBRNN(
            s.highlvl_hidden_size, num_layers=1,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        self.ques_self_attn = Attention(
            s.query_self_attn_hidden_size, correlation_func=3,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        if s.position_mod == "qk+":
            self.od_ocr_attn = Attention(
                s.hidden_size, correlation_func=3, do_similarity=True,
                dropout_p=s.dropout_p, variational=s.variational,
            )
            self.position_attn = Attention(
                s.hidden_size, correlation_func=3, do_similarity=True,
                dropout_p=s.dropout_p, variational=s.variational,
            )
        elif s.position_mod == "cat":
            self.od_ocr_attn = Attention(
                s.hidden_size, correlation_func=3, do_similarity=True,
                dropout_p=s.dropout_p, variational=s.variational,
            )
        self.ques_merger = LinearSelfAttn(
            dropout_p=s.dropout_p, variational=s.variational
        )

        ques_final = s.ques_final_size
        if s.img_feature and s.img_fea_way == "replace_od":
            self.img_fea2od = nn.Dense(s.multi2one_output)
        self.get_answer = GetFinalScores(
            s.ocr_final_size, ques_final,
            yesno=s.label_yesno, no_answer=s.label_no_answer, use_es=s.use_es,
            dropout_p=s.dropout_p, variational=s.variational,
        )
        if s.fixed_answers:
            self.fixed_ans_classifier = nn.Dense(s.fixed_answers_len + 1)
            self.fixed_ocr_alpha = self.param(
                "fixed_ocr_alpha", lambda k: jnp.full((1, 1), 0.5)
            )
        if s.use_es and s.es_using_way == "post_process":
            self.ES_linear = nn.Dense(s.ocr_final_size)
            self.ES_ocr_att = Attention(
                s.hidden_size, correlation_func=3, do_similarity=True,
                dropout_p=s.dropout_p, variational=s.variational,
            )

    # ------------------------------------------------------------------
    def _word_mask(self, item: Dict[str, jax.Array], initial: str) -> jax.Array:
        """Word mask keyed by the *_emb_initial conf value (the reference
        picks bert-pooling masks this way, `SDNet.py:470-480`)."""
        key = "fasttext" if initial == "fasttext" else "glove"
        return (item[key] != 0).astype(jnp.float32)

    @staticmethod
    def _mask_by_membership(item, names) -> jax.Array:
        """Word mask with fasttext-if-present priority (the reference's
        rule for multi2one/pre-align masks, `SDNet.py:269-274,507-518`)."""
        key = "fasttext" if "fasttext" in names else "glove"
        return (item[key] != 0).astype(jnp.float32)

    def _encode_rows(self, ids, seg, pos) -> jax.Array:
        """One encoder invocation on segment-form rows: ``seg`` [R, L]
        (0 = pad, >=1 = packed segment) and explicit ``pos`` [R, L]. For a
        single-segment row (seg = the attention mask, pos = arange) this is
        bit-equivalent to the dense attention-mask form: the per-(query,
        key) bias values are identical (0 / ATTN_MASK_BIAS — see
        BertModel.__call__ segment docs). Applies the alpha-combine /
        LOCK_BERT handling exactly like the in-place paths."""
        s = self.spec
        kw = dict(segment_ids=seg, position_ids=pos, deterministic=True)
        if s.bert_linear_combine:
            w = jax.nn.softmax(self.alphaBERT) * self.gammaBERT.reshape(())
            return self.Bert(
                ids, None, combine_weights=w,
                stop_layer_gradients=s.lock_bert, **kw,
            )[0]
        all_layers = self.Bert(ids, None, **kw)[0]
        if s.lock_bert:
            all_layers = jax.lax.stop_gradient(all_layers)
        return all_layers[-1]

    def _bert_row_spec(self, item) -> Optional[Tuple[jax.Array, ...]]:
        """(ids, seg, pos) encoder rows for one q/candidate block in
        segment form, or None when the block needs the in-place path
        (>512 chunking). Candidate blocks must already be flattened to
        [B*N, Lb] (q blocks are [B, Lqb] natively)."""
        s = self.spec
        if "bert_packed" in item:
            ids = item["bert_packed"]
            seg, pos = item["bert_packed_seg"], item["bert_packed_pos"]
        else:
            ids = item["bert_unique"] if "bert_unique" in item else item["bert"]
            seg = (ids != 0).astype(jnp.int32)
            pos = jnp.broadcast_to(
                jnp.arange(ids.shape[-1], dtype=jnp.int32)[None], ids.shape
            )
        if ids.shape[-1] > s.bert.max_position_embeddings:
            return None
        return ids, seg, pos

    def _fused_bert(
        self, q, ocr, od, od_encodes: bool
    ) -> Dict[str, jax.Array]:
        """ONE batched encoder call over every block whose rows share a
        token width (`bert_fuse`, default on; TPU perf — 12 layer kernels
        instead of 36, one big MXU batch instead of three small ones).

        The q rows join as single-segment rows (seg = mask, pos = arange),
        which produces bias values identical to the dense attention-mask
        form, so fusion is exact — the reference semantics (three separate
        encoder calls, `SDNet.py:445-489`) are unchanged. Blocks whose
        width differs from every other block (e.g. a 50-piece question
        batch vs the 32-wide packed tables) keep their own in-place call.
        Returns {block key: encoded rows [R, L, D]} for the fused blocks.
        """
        s = self.spec
        specs = []
        names_has_bert = lambda names: "bert" in names or "bert_only" in names
        # membership must resolve against the table keys too: h2d_slim
        # drops the dense `bert` grid when a packed/unique table rides along
        has_ids = lambda item: (
            "bert" in item or "bert_packed" in item or "bert_unique" in item
        )
        if names_has_bert(s.q_embedding) and has_ids(q):
            sp = self._bert_row_spec(q)
            if sp is not None:
                specs.append(("q", sp))
        for key, item, on in (("ocr", ocr, True), ("od", od, od_encodes)):
            if not (on and names_has_bert(s.ocr_embedding) and has_ids(item)):
                continue
            flat = item
            if "bert_packed" not in item and "bert_unique" not in item:
                if "cand_sel" in item:
                    # dense rows are compact-gathered INSIDE
                    # _encode_candidates — a full-grid fused encode would
                    # both defeat compaction and mismatch the gathered rows
                    continue
                flat = {"bert": _flatten_cand(item["bert"])}
            sp = self._bert_row_spec(flat)
            if sp is not None:
                specs.append((key, sp))
        by_width: Dict[int, list] = {}
        for key, sp in specs:
            by_width.setdefault(sp[0].shape[-1], []).append((key, sp))
        out: Dict[str, jax.Array] = {}
        for grp in by_width.values():
            if len(grp) < 2:
                continue  # nothing to fuse at this width
            ids, seg, pos = (
                jnp.concatenate([sp[i] for _, sp in grp], axis=0)
                for i in range(3)
            )
            encoded = self._encode_rows(ids, seg, pos)
            ofs = 0
            for key, sp in grp:
                n = sp[0].shape[0]
                out[key] = encoded[ofs:ofs + n]
                ofs += n
        return out

    def _bert_words(
        self, item, word_mask, deterministic, encoded=None
    ) -> jax.Array:
        """Shared BERT encode + combine + word pooling. Gradients are cut
        when LOCK_BERT (`SDNet.py:91-94`); BERT always runs dropout-free
        (`Bert.py:43`). Sequences longer than ``max_position_embeddings``
        are chunked at 512 and concatenated on the sequence axis BEFORE
        pooling, positions restarting per chunk — the reference's quirk
        (`Bert.py:94-101,133-140`), unrolled statically at trace time.
        ``encoded`` short-circuits the encoder with rows already computed
        by the fused batched call (`_fused_bert`); pooling is unchanged."""
        s = self.spec
        # candidate dedup (opt-in, see Collator._add_dedup): the encoder
        # output depends only on the piece-id row, so encode unique rows and
        # gather back; per-row offsets still pool each duplicate's own words
        packed = "bert_packed" in item
        dedup = "bert_unique" in item
        if encoded is not None:
            combined = encoded
        else:
            if packed:
                # sequence-packed unique table (Collator._add_pack): several
                # candidates share one encoder row behind a block-diagonal
                # segment mask with per-segment position restart — exact (see
                # models/bert/model.py segment_ids docs). Rows are packed-
                # short by construction (<= max_position_embeddings), so no
                # chunking.
                ids = item["bert_packed"]
                bert_kwargs = dict(
                    segment_ids=item["bert_packed_seg"],
                    position_ids=item["bert_packed_pos"],
                )
                mask = None
            elif dedup:
                ids = item["bert_unique"]
                mask = (ids != 0).astype(jnp.int32)
                bert_kwargs = {}
            else:
                ids = item["bert"]
                mask = item["bert_mask"]
                bert_kwargs = {}
            max_len = s.bert.max_position_embeddings
            spans = [
                (p, min(p + max_len, ids.shape[-1]))
                for p in range(0, ids.shape[-1], max_len)
            ]
            if packed:
                assert len(spans) == 1, \
                    "packed rows exceed max_position_embeddings"

            def run_bert(a, b, **kw):
                m = mask[:, a:b] if mask is not None else None
                return self.Bert(ids[:, a:b], m, deterministic=True,
                                 **bert_kwargs, **kw)[0]

            if s.bert_linear_combine:
                # fold softmax(alpha)*gamma into the encoder's in-loop layer
                # accumulation: never materializes the [L, B, Lb, D] stack
                w = jax.nn.softmax(self.alphaBERT) * self.gammaBERT.reshape(())
                chunks = [
                    run_bert(a, b, combine_weights=w,
                             stop_layer_gradients=s.lock_bert)
                    for a, b in spans
                ]
                combined = (
                    chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=1)
                )
            else:
                chunks = [run_bert(a, b) for a, b in spans]
                all_layers = (
                    chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=2)
                )
                if s.lock_bert:
                    all_layers = jax.lax.stop_gradient(all_layers)
                combined = all_layers[-1]
        pool_uniques = (packed or dedup) and "bert_unique_offsets" in item
        if pool_uniques:
            # pool-before-expand: the dedup key is the joint (pieces,
            # offsets) row (Collator._add_dedup), so word spans are well-
            # defined per UNIQUE row — pool subwords on the unique table
            # and expand the pooled [U, W, D] words to candidates, instead
            # of materializing the full [B*N, Lb, D] piece grid first. The
            # word mask is a per-(row, word) 0/1 scalar on the pooled
            # vector, so applying it AFTER the expand is exact.
            if packed:
                R, Lp, D = combined.shape
                flat_tokens = combined.reshape(R * Lp, D)
                combined = jnp.take(flat_tokens, item["bert_unpack"], axis=0)
            uo = item["bert_unique_offsets"]
            ones = jnp.ones(uo.shape[:2], dtype=jnp.float32)
            pooled_u = subword_to_word_pooling(combined, uo, ones)
            pooled = jnp.take(pooled_u, item["bert_inverse"], axis=0)
            pooled = pooled * word_mask[..., None]
        else:
            if packed:
                # scatter packed tokens back to per-candidate local rows:
                # unpack [cap, Lw] holds each unique row's flat token
                # positions in the packed grid; compose with the duplicate-
                # expansion gather in ONE indexed take (pad entries point at
                # token 0 — finite garbage pooling weights never read)
                R, Lp, D = combined.shape
                flat_tokens = combined.reshape(R * Lp, D)
                idx = jnp.take(item["bert_unpack"], item["bert_inverse"], axis=0)
                combined = jnp.take(flat_tokens, idx, axis=0)   # [B*N, Lw, D]
            elif dedup:
                combined = jnp.take(combined, item["bert_inverse"], axis=0)
            pooled = subword_to_word_pooling(
                combined, item["bert_offsets"], word_mask
            )
        if s.bert_linear_combine:
            pooled = dropout_fn(
                self, pooled, s.dropout_emb, s.variational, deterministic
            )
        return pooled

    def _embed(
        self,
        item: Dict[str, jax.Array],
        names: Tuple[str, ...],
        initial: str,
        deterministic: bool,
        encoded_bert: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Assemble the concatenated embedding (`SDNet.py:439-493`). Returns
        (embedding, extras) where extras carries the raw word-vector
        embedding used by pre-align / deep attention."""
        s = self.spec
        embs = []
        extras: Dict[str, jax.Array] = {}

        def drop(x):
            return dropout_fn(self, x, s.dropout_emb, s.variational, deterministic)

        if "phoc" in names:
            embs.append(drop(self.phoc_embed(item["phoc"])))
        if "fasttext" in names:
            fast = self.fast_embed(item["fasttext"])
            extras["word_emb"] = fast  # fasttext-if-present priority
            embs.append(drop(fast))
        if "glove" in names:
            glove = self.glove_embed(item["glove"])
            extras.setdefault("word_emb", glove)
            embs.append(drop(glove))
        if "bert" in names or "bert_only" in names:
            word_mask = self._word_mask(item, initial)
            embs.append(
                self._bert_words(
                    item, word_mask, deterministic, encoded=encoded_bert
                )
            )
        if "pos" in names:
            embs.append(self.pos_embedding(item["pos"]))
        if "ent" in names:
            embs.append(self.ent_embedding(item["ent"]))
        return jnp.concatenate(embs, axis=-1), extras

    # ------------------------------------------------------------------
    def _encode_candidates(
        self,
        item: Dict[str, jax.Array],
        q_word_emb: jax.Array,
        q_word_mask: jax.Array,
        deterministic: bool,
        encoded_bert: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Token-level embed + pre-align + multi2one -> candidate vectors.

        Returns (cand_feat [B, N, multi2one_out], cand_mask [B, N])."""
        s = self.spec
        B, N, L = item["fasttext" if s.use_fasttext else "glove"].shape[:3]
        # bert_unique / the packed-table tensors are batch-global, cand_sel
        # is a batch-global row index; everything else flattens
        # per-candidate to [B*N, ...]
        GLOBAL = (
            "bert_unique", "bert_packed", "bert_packed_seg",
            "bert_packed_pos", "bert_unpack", "bert_unique_offsets",
            "cand_sel",
        )
        flat = {
            k: (v if k in GLOBAL else _flatten_cand(v))
            for k, v in item.items()
            if k not in ("num",)
        }
        # candidate-row compaction (Collator._add_compact): every op from
        # token embedding through the multi2one last-state is row-
        # independent, so run it on the gathered REAL rows only and scatter
        # the [R_cap, H] result back — exact (pad rows are zeroed by
        # cand_mask below either way; the pad sentinel index B*N clamps on
        # gather and drops on scatter). Pre-align keeps the full [B, N*L]
        # layout: each token attends to its OWN question, which the batched
        # attention expresses without materializing per-row question copies.
        sel = flat.pop("cand_sel", None)

        if sel is not None:
            # pad entries carry the sentinel B*N: clamp them in-bounds for
            # every gather (an out-of-bounds take FILLS with NaN, which the
            # forward would drop but the backward would propagate into the
            # weight gradients) and zero their contribution on the way back
            # out with `valid` + scatter-ADD (the clamped target row B*N-1
            # just accumulates zeros)
            valid = (sel < B * N)
            sel = jnp.minimum(sel, B * N - 1)
            flat = {
                k: (v if k in GLOBAL else jnp.take(v, sel, axis=0))
                for k, v in flat.items()
            }
            emb, extras = self._embed(
                flat, s.ocr_embedding, s.ocr_emb_initial, deterministic,
                encoded_bert=encoded_bert,
            )
            if s.pre_align and s.pre_align_before_rnn:
                # per-question attend expressed on the GATHERED rows: the
                # question-side projection runs once at [B, Lq] and each
                # row r gathers its question's projected keys/values via
                # x2_row_index = sel[r] // N — no full-grid [B, N*L]
                # layout. Pad rows compute finite garbage attention that
                # the `valid` scaling below zeroes. (Training note: the
                # variational dropout mask on the token side is per
                # gathered ROW here vs per question in the dense layout —
                # both valid dropout, deterministic path identical.)
                tok_mask = self._mask_by_membership(flat, s.ocr_embedding)
                attended = self.pre_align(
                    extras["word_emb"], q_word_emb, q_word_mask,
                    deterministic=deterministic, x2_row_index=sel // N,
                )
                attended = attended * tok_mask[..., None]
                emb = jnp.concatenate([emb, attended], axis=-1)
            # profiler cut point (tools/profile_fusion.py): cost up to the
            # multi2one INPUT — no-op outside capture_intermediates
            self.sow("intermediates", "cand_emb", emb)
            m2o = self.multi2one(emb, deterministic=deterministic)
            last = gather_last_state(m2o, flat["len"])           # [R_cap, H]
            last = last * valid[:, None].astype(last.dtype)
            cand = (
                jnp.zeros((B * N, last.shape[-1]), last.dtype)
                .at[sel].add(last)
                .reshape(B, N, -1)
            )
        else:
            emb, extras = self._embed(
                flat, s.ocr_embedding, s.ocr_emb_initial, deterministic,
                encoded_bert=encoded_bert,
            )
            word_emb = extras["word_emb"]                         # [B*N, L, 300]
            tok_mask = self._mask_by_membership(flat, s.ocr_embedding)

            if s.pre_align and s.pre_align_before_rnn:
                # every token attends to the question's word vectors; padded
                # tokens zeroed to match the reference's zero-filled buffers
                tokens = word_emb.reshape(B, N * L, -1)
                attended = self.pre_align(
                    tokens, q_word_emb, q_word_mask, deterministic=deterministic
                )
                attended = attended.reshape(B * N, L, -1) * tok_mask[..., None]
                emb = jnp.concatenate([emb, attended], axis=-1)

            self.sow("intermediates", "cand_emb", emb)
            m2o = self.multi2one(emb, deterministic=deterministic)  # [B*N, L, H]
            last = gather_last_state(m2o, flat["len"])            # [B*N, H]
            cand = last.reshape(B, N, -1)
        cand_mask = (
            jnp.arange(N, dtype=jnp.int32)[None, :] < item["num"][:, None]
        ).astype(jnp.float32)
        cand = cand * cand_mask[..., None]
        return cand, cand_mask

    # ------------------------------------------------------------------
    def __call__(
        self,
        q: Dict[str, jax.Array],
        ocr: Dict[str, jax.Array],
        od: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        s = self.spec
        # widen narrowed H2D dtypes (collate.narrow_block ships int8/int16
        # grids over the wire; int32 is restored here as a free fused cast
        # on device — values are exact, see `h2d_narrow`)
        q, ocr, od = (_widen_ints(t) for t in (q, ocr, od))

        # --- fused encoder pass (TPU perf; exact — see _fused_bert) ----
        od_encodes = not (
            s.img_feature and s.img_fea_way in ("replace_od", "final_att")
        )
        fused = (
            self._fused_bert(q, ocr, od, od_encodes)
            if s.use_bert and s.bert_fuse
            else {}
        )

        # --- question embedding ---------------------------------------
        q_input, q_extras = self._embed(
            q, s.q_embedding, s.q_emb_initial, deterministic,
            encoded_bert=fused.get("q"),
        )
        q_word_emb = q_extras["word_emb"]
        q_mask = self._word_mask(q, s.q_emb_initial)

        # --- candidate encoding ---------------------------------------
        ocr_input, ocr_mask = self._encode_candidates(
            ocr, q_word_emb, q_mask, deterministic,
            encoded_bert=fused.get("ocr"),
        )
        ocr_position = ocr["position"]

        if s.img_feature and s.img_fea_way == "replace_od":
            od_input = self.img_fea2od(q["img_features"])
            od_mask = jnp.ones(od_input.shape[:2], dtype=jnp.float32)
            od_position = q["img_spatials"]
        elif s.img_feature and s.img_fea_way == "final_att":
            # reference zeroes the OD stream in this mode (`SDNet.py:282-286`)
            B, M = od["position"].shape[:2]
            od_input = jnp.zeros((B, M, s.multi2one_output))
            od_mask = jnp.zeros((B, M), dtype=jnp.float32)
            od_position = od["position"]
        else:
            od_input, od_mask = self._encode_candidates(
                od, q_word_emb, q_mask, deterministic,
                encoded_bert=fused.get("od"),
            )
            od_position = od["position"]

        # --- ES post_process split (`SDNet.py:292-324`) ----------------
        es_post = s.use_es and s.es_using_way == "post_process"
        if es_post:
            es_len = s.es_ocr_len
            es_emb = ocr_input[:, :es_len]
            ocr_input = ocr_input[:, es_len:]
            ocr_position = ocr_position[:, es_len:]
            # candidates shift down by es_len; the reference leaves the mask
            # bits of the first (cnt - es_len) positions set
            n_rest = ocr_input.shape[1]
            rest_cnt = jnp.clip(ocr["num"] - es_len, 0, n_rest)
            keep_all = ocr["num"] < es_len  # cnt < es_len keeps original bits
            ocr_mask = jnp.where(
                keep_all[:, None],
                ocr_mask[:, :n_rest],
                (jnp.arange(n_rest)[None, :] < rest_cnt[:, None]).astype(jnp.float32),
            )
            es_mask = jnp.ones((ocr_input.shape[0], es_len), dtype=jnp.float32)

        # --- PRE_ALIGN_after_rnn (`SDNet.py:330-336`) -------------------
        if s.pre_align and s.pre_align_after_rnn:
            ocr_prealign = self.pre_align(
                ocr_input, q_word_emb, q_mask, deterministic=deterministic
            )
            od_prealign = self.pre_align(
                od_input, q_word_emb, q_mask, deterministic=deterministic
            )

        # --- context / question RNN stacks ------------------------------
        _, ocr_rnn_layers = self.context_rnn(
            ocr_input, deterministic=deterministic, ln=True, return_list=True
        )
        _, q_rnn_layers = self.ques_rnn(
            q_input, deterministic=deterministic, ln=True, return_list=True
        )
        _, od_rnn_layers = self.context_rnn(
            od_input, deterministic=deterministic, ln=True, return_list=True
        )

        q_highlvl = self.high_lvl_ques_rnn(
            jnp.concatenate(q_rnn_layers, axis=2),
            deterministic=deterministic, ln=True,
        )
        q_rnn_all = list(q_rnn_layers) + [q_highlvl]

        # --- deep inter-attention ---------------------------------------
        if not s.use_glove and not s.use_fasttext:
            ocr_long, q_long, od_long = [], [], []
        elif s.pre_align_after_rnn:
            ocr_long, q_long, od_long = [ocr_prealign], [q_word_emb], [od_prealign]
        else:
            ocr_long, q_long, od_long = [ocr_input], [q_word_emb], [od_input]

        ocr_after, ocr_inter = self.deep_attn(
            ocr_long, ocr_rnn_layers, q_long, q_rnn_all, ocr_mask, q_mask,
            deterministic=deterministic, return_bef_rnn=True,
        )
        od_after, od_inter = self.deep_attn(
            od_long, od_rnn_layers, q_long, q_rnn_all, od_mask, q_mask,
            deterministic=deterministic, return_bef_rnn=True,
        )

        # --- self attention + high-level context RNN --------------------
        if s.no_context_self_attention:
            ocr_highlvl = self.high_lvl_context_rnn(
                ocr_after, deterministic=deterministic, ln=True
            )
            od_highlvl = self.high_lvl_context_rnn(
                od_after, deterministic=deterministic, ln=True
            )
        else:
            ocr_self_in = jnp.concatenate([ocr_after, ocr_inter, ocr_input], axis=2)
            od_self_in = jnp.concatenate([od_after, od_inter, od_input], axis=2)
            ocr_self = self.highlvl_self_att(
                ocr_self_in, ocr_self_in, ocr_mask, x3=ocr_after,
                deterministic=deterministic,
            )
            od_self = self.highlvl_self_att(
                od_self_in, od_self_in, od_mask, x3=od_after,
                deterministic=deterministic,
            )
            ocr_highlvl = self.high_lvl_context_rnn(
                jnp.concatenate([ocr_after, ocr_self], axis=2),
                deterministic=deterministic, ln=True,
            )
            od_highlvl = self.high_lvl_context_rnn(
                jnp.concatenate([od_after, od_self], axis=2),
                deterministic=deterministic, ln=True,
            )

        # --- position-aware OD -> OCR attention (`SDNet.py:393-403`) ----
        if s.position_mod == "qk+":
            x_od_ocr = self.od_ocr_attn(
                ocr_highlvl, od_highlvl, od_mask, deterministic=deterministic
            )
            pos_att = self.position_attn(
                ocr_position, od_position, od_mask, x3=od_highlvl,
                deterministic=deterministic,
            )
            x_od_ocr = x_od_ocr + pos_att
        elif s.position_mod == "cat":
            x_od_ocr = self.od_ocr_attn(
                jnp.concatenate([ocr_highlvl, ocr_position], axis=2),
                jnp.concatenate([od_highlvl, od_position], axis=2),
                od_mask, deterministic=deterministic,
            )

        if s.pos_att_merge_mod == "cat":
            ocr_final = jnp.concatenate([ocr_highlvl, x_od_ocr], axis=2)
        elif s.pos_att_merge_mod == "atted":
            ocr_final = x_od_ocr
        else:
            ocr_final = ocr_highlvl

        # --- question merge ----------------------------------------------
        q_final = self.ques_self_attn(
            q_highlvl, q_highlvl, q_mask, deterministic=deterministic
        )
        q_weights = self.ques_merger(q_final, q_mask, deterministic=deterministic)
        q_merged = weighted_avg(q_final, q_weights)

        # --- ES post_process merge (`SDNet.py:418-422`) -------------------
        if es_post:
            es_mid = self.ES_linear(es_emb)
            es_final = self.ES_ocr_att(
                es_mid, ocr_final, ocr_mask, deterministic=deterministic
            )
            ocr_final = jnp.concatenate([es_final, ocr_final], axis=-2)
            ocr_mask = jnp.concatenate([es_mask, ocr_mask], axis=-1)

        # --- scores --------------------------------------------------------
        score_s = self.get_answer(
            ocr_final, q_merged, ocr_mask,
            es_len=s.es_ocr_len if s.use_es else None,
            mask_flag=s.mask_score,
            deterministic=deterministic,
        )
        if s.fixed_answers:
            fixed_logits = jax.nn.softmax(
                self.fixed_ans_classifier(q_merged), axis=-1
            )
            alpha = self.fixed_ocr_alpha.reshape(())
            score_s = jnp.concatenate(
                [alpha * fixed_logits, (1.0 - alpha) * score_s], axis=-1
            )
        return score_s


def install_embeddings(
    params: Dict[str, Any],
    glove: Optional[Any] = None,
    fasttext: Optional[Any] = None,
    phoc: Optional[Any] = None,
) -> Dict[str, Any]:
    """Graft pretrained word-vector tables into an initialized param tree
    (the reference assigns them in `SDNet.py:51-67`)."""
    import jax.numpy as jnp

    p = dict(params)
    tree = dict(p["params"])
    if glove is not None:
        tree["glove_embed"] = {"embedding": jnp.asarray(glove)}
    if fasttext is not None:
        tree["fast_embed"] = {"embedding": jnp.asarray(fasttext)}
    if phoc is not None:
        tree["phoc_embed"] = {"embedding": jnp.asarray(phoc)}
    p["params"] = tree
    return p
