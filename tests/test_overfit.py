"""Gradient sanity: repeated steps on one batch must drive the loss down
(the whole stack — embeddings, scans, attentions, scorer — is trainable
end-to-end)."""

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.train.loss import make_loss_fn
from ruart_tpu.train.optim import make_optimizer, make_row_pinner
from ruart_tpu.train.train_step import init_train_state, make_train_step

from tests.test_fusion_model import tiny_model_and_params


def test_overfit_single_batch(shipped_conf_opt):
    # dropout off: the BCE-over-softmax objective has a tight dynamic range
    # (~9.5 -> ~8.6 floor), so stochastic masks would swamp 25 steps
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(
        shipped_conf_opt, extra={"DROPOUT": 0.0, "dropout_emb": 0.0}, batch=2
    )
    # one-hot target on a valid candidate
    tgt = np.zeros((2, cfg.dims.num_scores), dtype=np.float32)
    tgt[:, 1] = 1.0
    tgt = jnp.asarray(tgt)

    tx = make_optimizer("#", 5e-3, 10.0, params, spec, tune_partial=True)
    loss_fn = make_loss_fn("BCE_D1")
    pin = make_row_pinner(params, spec, tune_partial_rows=8)
    step = make_train_step(model, tx, loss_fn, pin, donate=False)
    state = init_train_state(params, tx, seed=0)

    losses = []
    for _ in range(25):
        state, loss = step(state, q, ocr, od, tgt)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # the objective's reachable range is only ~0.9 wide (9.5 -> 8.6 floor);
    # expect a clear monotone-ish decrease, not a 10x collapse
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, losses
    assert losses[-1] < losses[0], losses

    # frozen BERT stayed frozen; embeddings' pinned rows stayed pinned
    def max_delta(a, b):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        return max(float(jnp.abs(x - y).max()) for x, y in zip(fa, fb))

    assert max_delta(
        state.params["params"]["Bert"], params["params"]["Bert"]
    ) == 0.0
    emb0 = np.asarray(params["params"]["fast_embed"]["embedding"])
    emb1 = np.asarray(state.params["params"]["fast_embed"]["embedding"])
    np.testing.assert_array_equal(emb1[8:], emb0[8:])   # rows >= tune_partial
    np.testing.assert_array_equal(emb1[1], emb0[1])     # padding_idx row
    assert np.abs(emb1[2:8] - emb0[2:8]).max() > 0      # tuned rows moved
