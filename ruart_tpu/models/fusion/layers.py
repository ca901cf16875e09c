"""Fusion-network building blocks (JAX/flax).

From-scratch equivalents of the reference layer library
(`Models/Layers.py`), built for fixed-shape batched execution on TPU:

* :func:`seq_dropout` — variational (time-shared) dropout
  (`Layers.py:23-39`).
* :class:`AttentionScore` / :class:`Attention` — the 5 correlation kernels
  and masked softmax-attend (`Layers.py:182-295`). The hot config uses
  correlation_func=3: ``relu(Wx1) D relu(Wx2)^T``.
* :class:`LinearSelfAttn` — sequence-summary weights (`Layers.py:320-341`).
* :class:`BilinearSeqAttn` — ``x W y`` scores (`Layers.py:435-468`).
* :class:`GetFinalScores` — ES-split candidate scoring + yes/no/noread and
  no-answer scores, final softmax (`Layers.py:352-432`). The reference's
  GRU pointer hop computes an ``h1`` that is never consumed
  (`Layers.py:395-401`: attn2 is called with ``h0``); we skip that dead
  compute and do not allocate its parameters.
* :func:`weighted_avg` (`Layers.py:529-534`).

Masks are float/bool [.., L] with 1 = valid. All matmuls carry
``preferred_element_type=float32`` so the MXU accumulates in fp32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite -inf stand-in: keeps softmax NaN-free on all-masked rows


def seq_dropout(
    x: jax.Array, p: float, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Variational dropout: one [B, D] mask shared across the time axis
    (`Layers.py:23-30`). Falls back to plain dropout for non-3D inputs."""
    if deterministic or p == 0.0:
        return x
    assert rng is not None
    if x.ndim == 3:
        keep = jax.random.bernoulli(rng, 1.0 - p, (x.shape[0], 1, x.shape[2]))
        return x * keep.astype(x.dtype) / (1.0 - p)
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - p)


class Dropper(nn.Module):
    """Shared helper mixin-ish module: variational dropout bound to the
    'dropout' rng collection, matching the reference's global
    do_seq_dropout/dropout_p switches (`Layers.py:32-39`)."""

    p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        if self.variational and x.ndim == 3:
            return seq_dropout(x, self.p, deterministic, rng)
        keep = jax.random.bernoulli(rng, 1.0 - self.p, x.shape)
        return x * keep.astype(x.dtype) / (1.0 - self.p)


def dropout_fn(
    module: nn.Module, x: jax.Array, p: float, variational: bool, deterministic: bool
) -> jax.Array:
    """Functional dropout inside an nn.compact body."""
    if deterministic or p == 0.0:
        return x
    rng = module.make_rng("dropout")
    if variational and x.ndim == 3:
        return seq_dropout(x, p, deterministic, rng)
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - p)


def masked_softmax(scores: jax.Array, mask: Optional[jax.Array], axis: int = -1):
    """Softmax with invalid positions forced to ~0 probability."""
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, NEG_INF)
    return jax.nn.softmax(scores, axis=axis)


def weighted_avg(x: jax.Array, weights: jax.Array) -> jax.Array:
    """[B, L, D] x [B, L] -> [B, D] (`Layers.py:529-534`)."""
    return jnp.einsum("bl,bld->bd", weights, x, preferred_element_type=jnp.float32)


class AttentionScore(nn.Module):
    """Pairwise correlation scores (`Layers.py:182-245`).

    correlation_func: 1 x1·x2ᵀ | 2 (Wx1)D(Wx2)ᵀ | 3 relu(Wx1)D relu(Wx2)ᵀ |
    4 x1ᵀWx2 | 5 relu(Wx1)·relu(Wx2)ᵀ. ``do_similarity`` freezes D to
    1/sqrt(hidden) (non-trainable) as in the reference.
    """

    hidden_size: int
    correlation_func: int = 1
    do_similarity: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True, x2_row_index=None):
        """``x2_row_index`` [R] maps each x1 row to its x2 batch row: x1 is
        [R, Lx, D] gathered rows (e.g. compacted candidates), x2 stays
        [B, Ly, D] and is PROJECTED ONCE at batch granularity before the
        per-row gather — same math per row as the batch layout without
        recomputing the x2 projection per gathered row."""
        cf = self.correlation_func
        x1 = dropout_fn(self, x1, self.dropout_p, self.variational, deterministic)
        x2 = dropout_fn(self, x2, self.dropout_p, self.variational, deterministic)

        if cf in (2, 3):
            linear = nn.Dense(self.hidden_size, use_bias=False, name="linear")
            x1r = linear(x1)
            x2r = linear(x2)
            if cf == 3:
                x1r = jax.nn.relu(x1r)
                x2r = jax.nn.relu(x2r)
            if self.do_similarity:
                diag = jnp.full((self.hidden_size,), 1.0 / self.hidden_size**0.5)
            else:
                diag = self.param(
                    "diagonal", lambda k: jnp.ones((self.hidden_size,))
                )
            x1r = x1r * diag
        elif cf == 4:
            x2r = nn.Dense(x2.shape[-1], use_bias=False, name="linear")(x2)
            x1r = x1
        elif cf == 5:
            linear = nn.Dense(self.hidden_size, use_bias=False, name="linear")
            x1r = jax.nn.relu(linear(x1))
            x2r = jax.nn.relu(linear(x2))
        else:
            x1r, x2r = x1, x2
        if x2_row_index is not None:
            x2r = jnp.take(x2r, x2_row_index, axis=0)
        return jnp.einsum(
            "bid,bjd->bij", x1r, x2r, preferred_element_type=jnp.float32
        )


class Attention(nn.Module):
    """Masked attend: softmax(score(x1, x2)) @ x3 (`Layers.py:247-295`)."""

    hidden_size: int
    correlation_func: int = 1
    do_similarity: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(
        self,
        x1,
        x2,
        x2_mask,
        x3=None,
        drop_diagonal: bool = False,
        deterministic: bool = True,
        return_score: bool = False,
        x2_row_index=None,
    ):
        """With ``x2_row_index`` [R], x1 is [R, Lx, D] gathered rows while
        x2/x2_mask/x3 stay batch-shaped [B, ...]: row r attends to batch row
        x2_row_index[r] (see AttentionScore)."""
        if x3 is None:
            x3 = x2
        scores = AttentionScore(
            self.hidden_size,
            self.correlation_func,
            self.do_similarity,
            self.dropout_p,
            self.variational,
            name="scoring",
        )(x1, x2, deterministic, x2_row_index=x2_row_index)
        if x2_row_index is not None:
            x2_mask = jnp.take(x2_mask, x2_row_index, axis=0)
            x3 = jnp.take(x3, x2_row_index, axis=0)
        mask = x2_mask.astype(bool)[:, None, :]
        scores = jnp.where(mask, scores, NEG_INF)
        if drop_diagonal:
            eye = jnp.eye(scores.shape[1], dtype=bool)[None]
            scores = jnp.where(eye, NEG_INF, scores)
        alpha = jax.nn.softmax(scores, axis=-1)
        # expose attention maps to capture_intermediates (the reference's
        # att_score debugging surface, `SDNet.py:253-258`); no-op unless the
        # caller passes mutable=['intermediates']
        self.sow("intermediates", "alpha", alpha)
        attended = jnp.einsum(
            "bij,bjd->bid", alpha, x3, preferred_element_type=jnp.float32
        )
        if return_score:
            return attended, alpha
        return attended


class LinearSelfAttn(nn.Module):
    """softmax(Wx) summary weights over a sequence (`Layers.py:320-341`)."""

    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        xd = dropout_fn(self, x, self.dropout_p, self.variational, deterministic)
        scores = nn.Dense(1, name="linear")(xd)[..., 0]
        return masked_softmax(scores, x_mask)


class BilinearSeqAttn(nn.Module):
    """o_i = x_i' W y scores over a sequence (`Layers.py:435-468`)."""

    x_size: int
    identity: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(self, x, y, x_mask, mask_flag: bool = True, deterministic=True):
        x = dropout_fn(self, x, self.dropout_p, self.variational, deterministic)
        y = dropout_fn(self, y, self.dropout_p, self.variational, deterministic)
        Wy = y if self.identity else nn.Dense(self.x_size, name="linear")(y)
        xWy = jnp.einsum("bld,bd->bl", x, Wy, preferred_element_type=jnp.float32)
        if mask_flag:
            xWy = jnp.where(x_mask.astype(bool), xWy, NEG_INF)
        return xWy


class GetFinalScores(nn.Module):
    """Final candidate scores (`Layers.py:352-432`).

    With ``use_es`` the candidate axis is split at ``es_len`` (ES candidates
    score via a second bilinear head). Sentinel heads (yes/no/noread,
    no-answer) each use an attended-summary + linear-to-scalar. Output is
    softmaxed over the concatenated score vector (`Layers.py:418`) —
    the training loss is BCE over these softmaxed values, reproducing the
    reference exactly (`SDNetTrainer.py:510-518`).
    """

    x_size: int
    h_size: int
    yesno: bool = False
    no_answer: bool = False
    use_es: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        h0,
        x_mask,
        es_len: Optional[int] = None,
        mask_flag: bool = False,
        deterministic: bool = True,
    ):
        if self.use_es:
            assert es_len is not None
            x_es, x_ocr = x[:, :es_len], x[:, es_len:]
            es_mask, ocr_mask = x_mask[:, :es_len], x_mask[:, es_len:]
            score_ocr = BilinearSeqAttn(
                self.x_size, dropout_p=self.dropout_p,
                variational=self.variational, name="attn",
            )(x_ocr, h0, ocr_mask, mask_flag, deterministic)
            # Reference computes a GRU pointer state h1 here but never uses
            # it (`Layers.py:395-401`); dead compute omitted.
            score_es = BilinearSeqAttn(
                self.x_size, dropout_p=self.dropout_p,
                variational=self.variational, name="attn2",
            )(x_es, h0, es_mask, mask_flag, deterministic)
            score_s = jnp.concatenate([score_es, score_ocr], axis=-1)
        else:
            score_s = BilinearSeqAttn(
                self.x_size, dropout_p=self.dropout_p,
                variational=self.variational, name="attn",
            )(x, h0, x_mask, mask_flag, deterministic)

        if self.yesno:
            h0d = dropout_fn(self, h0, self.dropout_p, self.variational, deterministic)
            s_no = self._single(x, h0d, x_mask, "no")
            s_yes = self._single(x, h0d, x_mask, "yes")
            s_noread = self._single(x, h0d, x_mask, "no_read")
            score_s = jnp.concatenate([s_noread, s_yes, s_no, score_s], axis=-1)
        if self.no_answer:
            h0d = dropout_fn(self, h0, self.dropout_p, self.variational, deterministic)
            s_na = self._single(x, h0d, x_mask, "noanswer")
            score_s = jnp.concatenate([score_s, s_na], axis=-1)
        return jax.nn.softmax(score_s, axis=-1)

    def _single(self, x, h, x_mask, prefix: str):
        """Attended-summary scalar score (`Layers.py:421-432`)."""
        Wh = nn.Dense(self.x_size, name=f"{prefix}_linear")(h)
        xWh = jnp.einsum("bld,bd->bl", x, Wh, preferred_element_type=jnp.float32)
        alpha = masked_softmax(xWh, x_mask)
        attn_x = jnp.einsum(
            "bl,bld->bd", alpha, x, preferred_element_type=jnp.float32
        )
        return nn.Dense(1, name=f"{prefix}_w")(attn_x)


def whole_tensor_layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """``F.layer_norm(x, x.size())`` — normalization over ALL axes with no
    learned affine, the quirky form used after every context RNN layer
    (`Layers.py:167-168`)."""
    mean = jnp.mean(x)
    var = jnp.var(x)
    return (x - mean) * jax.lax.rsqrt(var + eps)
