import numpy as np
import jax
import jax.numpy as jnp
import torch

from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.bert.convert import convert_bert_state_dict
from ruart_tpu.models.bert.model import (
    BertModel,
    BertWordEncoder,
    linear_combine,
    subword_to_word_pooling,
)


def _tiny_torch_bert(seed=0):
    from transformers import BertConfig as HFConfig, BertModel as HFBert

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_act="gelu",
    )
    model = HFBert(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_bert_matches_transformers_all_layers():
    hf, hf_cfg = _tiny_torch_bert()
    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    )
    params = {"params": convert_bert_state_dict(hf.state_dict(), 3)}

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), dtype=np.int32)
    mask[0, 7:] = 0

    with torch.no_grad():
        t_out = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    model = BertModel(cfg)
    all_layers, pooled = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    # hidden_states[0] is the embedding output; layers are [1:]
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(all_layers[i]),
            t_out.hidden_states[i + 1].numpy(),
            atol=3e-5,
            err_msg=f"layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(pooled), t_out.pooler_output.numpy(), atol=3e-5
    )


def test_subword_pooling_matches_reference_loop():
    """Segment-mean matmul == the reference Python double loop
    (Bert.py:111-123 semantics)."""
    rng = np.random.RandomState(1)
    B, Lb, D, W = 2, 12, 8, 5
    emb = rng.randn(B, Lb, D).astype(np.float32)
    offsets = np.zeros((B, W, 2), dtype=np.int32)
    mask = np.zeros((B, W), dtype=np.int32)
    # word 0: single piece; word 1: 3 pieces; word 2: empty span (st==ed);
    # word 3: masked; word 4: 2 pieces
    spans = [(1, 2), (2, 5), (5, 5), (0, 0), (5, 7)]
    for b in range(B):
        for w, (st, ed) in enumerate(spans):
            offsets[b, w] = (st, ed)
            mask[b, w] = 0 if w == 3 else 1

    expected = np.zeros((B, W, D), dtype=np.float32)
    for b in range(B):
        for w in range(W):
            if mask[b, w] == 0:
                continue
            st, ed = offsets[b, w]
            if st + 1 == ed or st == ed:
                expected[b, w] = emb[b, st]
            elif st < ed:
                expected[b, w] = emb[b, st:ed].sum(0) / float(ed - st)

    out = subword_to_word_pooling(jnp.asarray(emb), jnp.asarray(offsets), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_pooling_with_layer_axis():
    rng = np.random.RandomState(2)
    emb = rng.randn(3, 2, 6, 4).astype(np.float32)  # [L, B, Lb, D]
    offsets = np.array([[[1, 3], [3, 4]]] * 2, dtype=np.int32)
    mask = np.ones((2, 2), dtype=np.int32)
    out = subword_to_word_pooling(jnp.asarray(emb), jnp.asarray(offsets), jnp.asarray(mask))
    assert out.shape == (3, 2, 2, 4)


def test_linear_combine_matches_reference_order():
    """Combine-then-pool == pool-then-combine (linearity), and matches the
    explicit softmax(alpha)*gamma sum of SDNet.linear_sum."""
    rng = np.random.RandomState(3)
    L, B, Lb, D = 4, 2, 6, 5
    layers = rng.randn(L, B, Lb, D).astype(np.float32)
    alpha = rng.randn(L).astype(np.float32)
    gamma = np.array([[1.7]], dtype=np.float32)

    combined = linear_combine(jnp.asarray(layers), jnp.asarray(alpha), jnp.asarray(gamma))
    w = np.exp(alpha - alpha.max())
    w = w / w.sum()
    expected = (layers * w[:, None, None, None]).sum(0) * 1.7
    np.testing.assert_allclose(np.asarray(combined), expected, atol=1e-5)

    offsets = np.array([[[0, 2], [2, 6]]] * B, dtype=np.int32)
    mask = np.ones((B, 2), dtype=np.int32)
    pool_then_combine = linear_combine(
        subword_to_word_pooling(jnp.asarray(layers), jnp.asarray(offsets), jnp.asarray(mask)),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
    )
    combine_then_pool = subword_to_word_pooling(
        combined, jnp.asarray(offsets), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(combine_then_pool), np.asarray(pool_then_combine), atol=1e-5
    )


def test_bert_word_encoder_shapes():
    cfg = BertConfig.tiny()
    model = BertWordEncoder(cfg)
    B, Lb, W = 2, 10, 4
    ids = jnp.ones((B, Lb), dtype=jnp.int32)
    mask = jnp.ones((B, Lb), dtype=jnp.int32)
    offsets = jnp.tile(jnp.array([[[1, 2], [2, 4], [4, 4], [5, 9]]], dtype=jnp.int32), (B, 1, 1))
    wmask = jnp.ones((B, W), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, offsets, wmask)
    out = model.apply(params, ids, mask, offsets, wmask)
    assert out.shape == (B, W, cfg.hidden_size)


def test_inloop_combine_matches_stack_combine():
    """combine_weights in-loop accumulation == stack-then-linear_combine."""
    cfg = BertConfig.tiny()
    model = BertModel(cfg)
    ids = jnp.arange(20, dtype=jnp.int32).reshape(2, 10) % cfg.vocab_size
    mask = jnp.ones((2, 10), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    all_layers, _ = model.apply(params, ids, mask)
    alpha = jnp.array([0.1, -0.4, 2.0])
    gamma = jnp.array([[1.3]])
    ref = linear_combine(all_layers, alpha, gamma)
    w = jax.nn.softmax(alpha) * gamma.reshape(())
    combined, _ = model.apply(params, ids, mask, combine_weights=w)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(ref), atol=1e-5)


def test_encode_chunked_splits_positions():
    """>512 chunking: positions restart per chunk (Bert.py:94-101 quirk)."""
    from ruart_tpu.models.bert.model import encode_chunked

    cfg = BertConfig.tiny(max_position_embeddings=8)
    model = BertModel(cfg)
    ids = jnp.ones((2, 16), dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids[:, :8], mask[:, :8])
    out = encode_chunked(model, params, ids, mask, max_chunk=8)
    assert out.shape == (cfg.num_hidden_layers, 2, 16, cfg.hidden_size)
    # identical content per chunk + restarted positions -> identical outputs
    np.testing.assert_allclose(
        np.asarray(out[:, :, :8]), np.asarray(out[:, :, 8:]), atol=1e-5
    )
