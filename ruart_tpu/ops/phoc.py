"""PHOC string encoding — vectorized on-device JAX op.

Encodes whole batches of OCR-candidate strings on the TPU: the host packs
each (pre-filtered) string into a fixed-shape char-id array, and the device
turns character occupancy into region-overlap indicators with two small
einsums instead of the reference's per-string C loop
(`Utils/cphoc.c:32-103`).

Bit-faithfulness: the >=0.5 overlap rule is evaluated in IEEE float32 in the
C kernel, and XLA's fp32 division is not correctly rounded on all backends
(observed: ``5/6`` rounds differently under XLA-CPU than under C/numpy,
flipping knife-edge regions). The overlap test depends only on
``(length, position, region)`` — a finite domain — so we precompute the
region-activity tables on host with numpy fp32 (which matches C exactly) and
the device op is a pure gather + matmul. Zero divisions on device, exact
parity with the native oracle.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ruart_tpu.core.constants import PHOC_BIGRAMS, PHOC_DIM, PHOC_UNIGRAMS

N_UNI = 36
N_BI = 50
N_REGIONS = 14  # levels 2+3+4+5

# Static (region_start, region_end) tables in cphoc row order
# (level 2 -> rows 0..1, level 3 -> 2..4, level 4 -> 5..8, level 5 -> 9..13).
_REGION_LO = np.concatenate(
    [np.arange(l, dtype=np.float32) / np.float32(l) for l in (2, 3, 4, 5)]
)
_REGION_HI = np.concatenate(
    [(np.arange(l, dtype=np.float32) + 1) / np.float32(l) for l in (2, 3, 4, 5)]
)

_UNI_INDEX = {c: i for i, c in enumerate(PHOC_UNIGRAMS)}
# 36*36 flat bigram lookup: pair (a,b) -> bigram id or -1
_BI_TABLE = np.full((N_UNI * N_UNI,), -1, dtype=np.int32)
for _i, _bg in enumerate(PHOC_BIGRAMS):
    _BI_TABLE[_UNI_INDEX[_bg[0]] * N_UNI + _UNI_INDEX[_bg[1]]] = _i


@functools.lru_cache(maxsize=8)
def _occupancy_tables(max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-precomputed fp32 region-activity tables.

    Returns (uni [max_len+1, max_len, 14], bi [max_len+1, max_len, 2])
    float32 {0,1} arrays: entry [n, i, r] says whether character (resp.
    bigram starting at) position i of an n-char string activates region r,
    evaluated with the exact fp32 arithmetic of `cphoc.c:52-69,89-102`.
    """
    f32 = np.float32
    n_axis = np.arange(1, max_len + 1, dtype=f32)[:, None, None]      # [N,1,1]
    i_axis = np.arange(max_len, dtype=f32)[None, :, None]             # [1,L,1]
    lo = _REGION_LO[None, None, :]                                    # [1,1,14]
    hi = _REGION_HI[None, None, :]

    c0 = (i_axis / n_axis).astype(f32)
    c1 = ((i_axis + f32(1.0)) / n_axis).astype(f32)
    frac = (np.minimum(c1, hi) - np.maximum(c0, lo)) / (c1 - c0)
    uni = (frac >= f32(0.5)).astype(f32)
    uni *= (i_axis < n_axis)  # positions beyond length never fire

    b1 = ((i_axis + f32(2.0)) / n_axis).astype(f32)
    bfrac = (np.minimum(b1, hi[..., :2]) - np.maximum(c0, lo[..., :2])) / (b1 - c0)
    bi = (bfrac >= f32(0.5)).astype(f32)
    bi *= ((i_axis + 1) < n_axis)  # bigram needs i+1 < n

    # prepend the n=0 row (all zeros)
    uni = np.concatenate([np.zeros_like(uni[:1]), uni], axis=0)
    bi = np.concatenate([np.zeros_like(bi[:1]), bi], axis=0)
    return uni, bi


def encode_char_ids(
    tokens: Sequence[str], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host packing: tokens -> (char_ids [n, max_len] int32 with -1 pad,
    lengths [n] int32). Tokens are filtered like the reference wrapper
    (`Utils/CoQAUtils.py:69-71`) and truncated at ``max_len``."""
    from ruart_tpu.text.phoc import filter_token

    n = len(tokens)
    ids = np.full((n, max_len), -1, dtype=np.int32)
    lengths = np.zeros((n,), dtype=np.int32)
    for i, tok in enumerate(tokens):
        w = filter_token(tok)[:max_len]
        lengths[i] = len(w)
        for j, c in enumerate(w):
            ids[i, j] = _UNI_INDEX[c]
    return ids, lengths


def phoc_from_char_ids(char_ids: jax.Array, lengths: jax.Array) -> jax.Array:
    """Device op: char ids [..., L] (int32, -1 pad) + lengths [...] ->
    PHOC [..., 604] float32.

    The unigram pyramid is an einsum of a gathered [L, 14] region-activity
    mask with a [L, 36] char one-hot; bigrams likewise over 2 regions x 50
    bigrams. All region geometry comes from host-precomputed fp32 tables.
    """
    batch_shape = char_ids.shape[:-1]
    L = char_ids.shape[-1]
    ids = char_ids.reshape(-1, L)
    n = lengths.reshape(-1).astype(jnp.int32)

    uni_tab, bi_tab = _occupancy_tables(L)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = (ids >= 0) & (pos < n[:, None])

    active = jnp.take(jnp.asarray(uni_tab), n, axis=0)       # [B,L,14]
    active = active * valid[..., None]
    onehot = jax.nn.one_hot(jnp.where(valid, ids, 0), N_UNI, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    uni = jnp.einsum(
        "blr,blu->bru", active, onehot, preferred_element_type=jnp.float32
    )
    uni = (uni > 0).astype(jnp.float32).reshape(-1, N_REGIONS * N_UNI)

    next_ids = jnp.concatenate(
        [ids[:, 1:], jnp.full_like(ids[:, :1], -1)], axis=1
    )
    pair_valid = valid & (next_ids >= 0) & (pos + 1 < n[:, None])
    flat = jnp.where(pair_valid, ids * N_UNI + jnp.maximum(next_ids, 0), 0)
    bi_ids = jnp.take(jnp.asarray(_BI_TABLE), flat)          # [B,L]
    has_bi = pair_valid & (bi_ids >= 0)

    bactive = jnp.take(jnp.asarray(bi_tab), n, axis=0)       # [B,L,2]
    bactive = bactive * has_bi[..., None]
    bi_onehot = jax.nn.one_hot(
        jnp.where(has_bi, bi_ids, 0), N_BI, dtype=jnp.float32
    ) * has_bi[..., None]
    bi = jnp.einsum(
        "blr,blg->brg", bactive, bi_onehot, preferred_element_type=jnp.float32
    )
    bi = (bi > 0).astype(jnp.float32).reshape(-1, 2 * N_BI)

    out = jnp.concatenate([uni, bi], axis=-1)
    return out.reshape(*batch_shape, PHOC_DIM)


@jax.jit
def phoc_batch_jit(char_ids: jax.Array, lengths: jax.Array) -> jax.Array:
    return phoc_from_char_ids(char_ids, lengths)
