"""The system LEARNS, not just "loss goes down": on a synthetic task where
exactly one OCR candidate's tokens match the question's, training must
drive eval ANLS above 0.9 (the planted candidate wins the argmax on
held-out data). Upgrades test_overfit's gradient smoke test to a
task-selection test (the reference's end goal: pick the right candidate,
`SDNetTrainer.predict:402-426`)."""

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.core.config import Config
from ruart_tpu.core.presets import TINY_OVERRIDES
from ruart_tpu.data.synthetic import make_synthetic_batch
from ruart_tpu.eval.metrics import note_stvqa
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel
from ruart_tpu.models.fusion.spec import ModelSpec
from ruart_tpu.train.loss import make_loss_fn
from ruart_tpu.train.optim import make_optimizer, make_row_pinner
from ruart_tpu.train.train_step import init_train_state, make_train_step


def _planted_batch(spec, cfg, batch, seed):
    """Synthetic batch where candidate ``planted[b]`` copies the question's
    word/pos and wordpiece ids — the only content-matching candidate."""
    rng = np.random.RandomState(seed)
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, batch, seed=seed)
    n_scores = cfg.dims.num_scores
    tgt = np.zeros((batch, n_scores), dtype=np.float32)
    planted = np.zeros((batch,), dtype=np.int64)
    # disjoint id ranges: question words never appear in non-planted
    # candidates, so "shares tokens with the question" fully determines
    # the answer (no label noise from random collisions)
    v = spec.vocab_size
    q_lo, q_hi, c_lo, c_hi = 5, 5 + (v - 5) // 2, 5 + (v - 5) // 2, v
    for b in range(batch):
        qw = int((q["glove"][b] != 0).sum())
        q_ids = rng.randint(q_lo, q_hi, size=qw)
        q["glove"][b, :qw] = q_ids
        q["fasttext"][b, :qw] = q_ids
        # at least 4 real candidates so the argmax is non-trivial
        ocr["num"][b] = max(int(ocr["num"][b]), 4)
        for n in range(int(ocr["num"][b])):
            w = int(ocr["len"][b, n])
            c_ids = rng.randint(c_lo, c_hi, size=w)
            ocr["glove"][b, n, :w] = c_ids
            ocr["fasttext"][b, n, :w] = c_ids
        # plant anywhere below the sentinel (last real candidate)
        c = rng.randint(0, ocr["num"][b] - 1)
        planted[b] = c
        w = min(qw, ocr["glove"].shape[2])
        for key in ("glove", "fasttext", "pos"):
            ocr[key][b, c, :] = 0
            ocr[key][b, c, :w] = q[key][b, :w]
        ocr["len"][b, c] = w
        Lb = ocr["bert"].shape[2]
        ocr["bert"][b, c, :] = 0
        ocr["bert"][b, c, :Lb] = q["bert"][b, :Lb]
        ocr["bert_offsets"][b, c, :] = 0
        ocr["bert_offsets"][b, c, :w] = np.clip(
            q["bert_offsets"][b, :w], 0, Lb - 1
        )
        tgt[b, c] = 1.0
    ocr["bert_mask"] = (ocr["bert"] != 0).astype(np.int32)
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return to_j(q), to_j(ocr), to_j(od), jnp.asarray(tgt), planted


def test_training_selects_planted_candidate(shipped_conf_opt):
    opt = dict(shipped_conf_opt)
    opt.update(TINY_OVERRIDES)
    # dropout off: 60 steps is too few to average over stochastic masks
    opt.update({"DROPOUT": 0.0, "dropout_emb": 0.0})
    cfg = Config(opt)
    spec = ModelSpec.from_config(cfg, BertConfig.tiny(vocab_size=64))
    model = RUArtModel(spec)
    B = 8

    q, ocr, od, tgt, _ = _planted_batch(spec, cfg, B, seed=0)
    params = model.init(jax.random.PRNGKey(0), q, ocr, od)
    tx = make_optimizer("#", 1e-2, 10.0, params, spec, tune_partial=True)
    pin = make_row_pinner(params, spec, tune_partial_rows=8)
    # CE is the reference's alternate conf loss (`SDNetTrainer.py:343-344`);
    # the shipped BCE-over-softmax has a gradient floor that needs epochs,
    # not a test budget (test_overfit covers its descent)
    step = make_train_step(model, tx, make_loss_fn("CE"), pin, donate=False)
    state = init_train_state(params, tx, seed=0)

    # fresh planted batches every step: the model must learn the RULE
    # (match question tokens), not memorize one batch
    n_steps = 600
    for i in range(n_steps):
        q, ocr, od, tgt, _ = _planted_batch(spec, cfg, B, seed=1 + (i % 80))
        state, loss = step(state, q, ocr, od, tgt)
    assert np.isfinite(float(loss))

    # held-out eval: unseen seeds; ANLS computed through the real decode
    # contract (answer string == planted candidate's string -> score 1.0)
    fwd = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c, deterministic=True))
    scores_anls = []
    hits = total = 0
    for seed in (101, 102, 103, 104):
        q, ocr, od, tgt, planted = _planted_batch(spec, cfg, B, seed=seed)
        s = np.asarray(fwd(state.params, q, ocr, od))
        num = np.asarray(ocr["num"])
        for b in range(B):
            # candidate columns only (drop the trailing no-answer slot),
            # sentinel (num-1) and pad candidates excluded like the decoder
            cand = s[b, : cfg.max_ocr_num].copy()
            cand[int(num[b]) - 1 :] = -np.inf
            pred = int(cand.argmax())
            # distinct per-candidate strings: any wrong pick scores ANLS 0
            # (edit distance >= length), exact pick scores 1
            pred_str = chr(ord("a") + pred) * 6
            gt_str = chr(ord("a") + int(planted[b])) * 6
            scores_anls.append(note_stvqa([gt_str], pred_str))
            hits += pred == planted[b]
            total += 1
    anls = float(np.mean(scores_anls))
    assert anls > 0.9, f"eval ANLS {anls:.3f} ({hits}/{total} correct)"
