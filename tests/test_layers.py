import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ruart_tpu.models.fusion.layers import (
    Attention,
    AttentionScore,
    BilinearSeqAttn,
    GetFinalScores,
    LinearSelfAttn,
    masked_softmax,
    weighted_avg,
)


def test_attention_corr3_matches_torch_formula():
    """corr3: relu(Wx1) D relu(Wx2)^T with masked softmax attend."""
    torch.manual_seed(0)
    B, L1, L2, D, H = 2, 3, 5, 8, 6
    W = torch.randn(H, D) * 0.3
    diag = torch.rand(H) + 0.5
    x1 = torch.randn(B, L1, D)
    x2 = torch.randn(B, L2, D)
    mask = torch.tensor([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=torch.bool)

    with torch.no_grad():
        r1 = F.relu(x1 @ W.T) * diag
        r2 = F.relu(x2 @ W.T)
        scores = r1 @ r2.transpose(1, 2)
        scores = scores.masked_fill(~mask[:, None, :], -float("inf"))
        alpha = F.softmax(scores, dim=-1)
        expected = alpha @ x2

    model = Attention(hidden_size=H, correlation_func=3)
    params = {
        "params": {
            "scoring": {
                "linear": {"kernel": jnp.asarray(W.numpy().T)},
                "diagonal": jnp.asarray(diag.numpy()),
            }
        }
    }
    out = model.apply(
        params, jnp.asarray(x1.numpy()), jnp.asarray(x2.numpy()),
        jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), atol=2e-5)


def test_attention_do_similarity_fixed_diag():
    B, L, D, H = 1, 4, 8, 16
    model = AttentionScore(hidden_size=H, correlation_func=3, do_similarity=True)
    x = jnp.ones((B, L, D))
    params = model.init(jax.random.PRNGKey(0), x, x)
    # no trainable diagonal param when do_similarity
    assert "diagonal" not in params["params"]
    s = model.apply(params, x, x)
    assert s.shape == (B, L, L)


def test_attention_x3_and_drop_diagonal():
    B, L, D, H = 2, 4, 6, 5
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, D))
    x3 = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3))
    mask = jnp.ones((B, L))
    model = Attention(hidden_size=H, correlation_func=3)
    params = model.init(key, x, x, mask)
    out, alpha = model.apply(
        params, x, x, mask, x3=x3, drop_diagonal=True, return_score=True
    )
    assert out.shape == (B, L, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(alpha, axis1=1, axis2=2)), 0.0, atol=1e-12
    )


def test_linear_self_attn_matches_torch():
    torch.manual_seed(1)
    B, L, D = 2, 5, 7
    W = torch.randn(1, D)
    b = torch.randn(1)
    x = torch.randn(B, L, D)
    mask = torch.tensor([[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], dtype=torch.bool)
    with torch.no_grad():
        scores = (x @ W.T + b)[..., 0]
        scores = scores.masked_fill(~mask, -float("inf"))
        expected = F.softmax(scores, dim=-1)
    model = LinearSelfAttn()
    params = {
        "params": {
            "linear": {
                "kernel": jnp.asarray(W.numpy().T),
                "bias": jnp.asarray(b.numpy()),
            }
        }
    }
    out = model.apply(params, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), atol=1e-5)
    # weighted_avg contract
    avg = weighted_avg(jnp.asarray(x.numpy()), out)
    expected_avg = (expected.unsqueeze(1) @ x).squeeze(1)
    np.testing.assert_allclose(np.asarray(avg), expected_avg.numpy(), atol=1e-5)


def test_bilinear_seq_attn_matches_torch():
    torch.manual_seed(2)
    B, L, Dx, Dy = 2, 4, 6, 5
    W = torch.randn(Dx, Dy)
    b = torch.randn(Dx)
    x = torch.randn(B, L, Dx)
    y = torch.randn(B, Dy)
    mask = torch.tensor([[1, 1, 1, 0], [1, 0, 0, 0]], dtype=torch.bool)
    with torch.no_grad():
        Wy = y @ W.T + b
        xWy = (x @ Wy.unsqueeze(2)).squeeze(2)
        masked = xWy.masked_fill(~mask, -float("inf"))
    model = BilinearSeqAttn(x_size=Dx)
    params = {
        "params": {
            "linear": {
                "kernel": jnp.asarray(W.numpy().T),
                "bias": jnp.asarray(b.numpy()),
            }
        }
    }
    out = model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
        jnp.asarray(mask.numpy()), mask_flag=True,
    )
    out_np = np.asarray(out)
    m = mask.numpy()
    np.testing.assert_allclose(out_np[m], xWy.numpy()[m], atol=1e-5)
    assert (out_np[~m] < -1e29).all()
    # mask_flag=False leaves scores untouched
    out2 = model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
        jnp.asarray(mask.numpy()), mask_flag=False,
    )
    np.testing.assert_allclose(np.asarray(out2), xWy.numpy(), atol=1e-5)


def test_get_final_scores_es_split():
    B, N, Dx, Dh, ES = 2, 12, 10, 8, 4
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, N, Dx))
    h0 = jax.random.normal(jax.random.PRNGKey(4), (B, Dh))
    mask = jnp.ones((B, N))
    model = GetFinalScores(
        x_size=Dx, h_size=Dh, yesno=False, no_answer=True, use_es=True
    )
    params = model.init(key, x, h0, mask, es_len=ES, mask_flag=True)
    scores = model.apply(params, x, h0, mask, es_len=ES, mask_flag=True)
    # N candidates + 1 no-answer, softmaxed
    assert scores.shape == (B, N + 1)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(scores) >= 0).all()
    # heads present: attn, attn2, noanswer; no dead GRU params
    names = set(params["params"].keys())
    assert names == {"attn", "attn2", "noanswer_linear", "noanswer_w"}


def test_get_final_scores_yesno_layout():
    B, N, Dx, Dh = 1, 5, 6, 4
    x = jnp.ones((B, N, Dx))
    h0 = jnp.ones((B, Dh))
    mask = jnp.ones((B, N))
    model = GetFinalScores(x_size=Dx, h_size=Dh, yesno=True, no_answer=True)
    params = model.init(jax.random.PRNGKey(0), x, h0, mask)
    scores = model.apply(params, x, h0, mask)
    # [noread, yes, no] + N + [noanswer]
    assert scores.shape == (B, 3 + N + 1)


def test_masked_softmax_all_masked_no_nan():
    scores = jnp.ones((2, 3))
    mask = jnp.zeros((2, 3))
    out = masked_softmax(scores, mask)
    assert not np.isnan(np.asarray(out)).any()
