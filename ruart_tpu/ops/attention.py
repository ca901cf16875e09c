"""Pallas fused multi-head attention for the BERT encoder.

Fuses QKᵀ → bias add → softmax → PV into one VMEM-resident kernel per
(batch, head) so the [L, L] score matrix never round-trips HBM — the
reference materializes it per layer (`Models/Bert/modeling.py:233-246`).

Shape regime: the pipeline's BERT sequences are short (<= 512 by
construction — the >512 chunking happens upstream, `Bert.py:94-99`) but the
batch axis is huge (batch x 100 OCR candidates flattened), so the kernel
holds a full [L, D] tile per program and parallelizes over the B*H grid;
no streaming-softmax tiling over L is needed (512 x 64 x 3 x 4B ≈ 400 KB of
VMEM). Numerics match the XLA path: fp32 accumulation, bias added before a
max-subtracted softmax.

Measured guidance (v5e-1, flagship shapes, [1600, 30, 768]): the packed
grouped kernel at group=16 runs **2.66x faster than the XLA einsum path in
bf16** (3.21 ms vs 8.52 ms) and 1.70x in fp32 (4.72 ms vs 8.03 ms), so it
is the default on TPU (``attention_impl='auto'``). group>=32 in fp32
overflows the 16 MB scoped-VMEM budget ([G,L,D] x 4 inputs x double
buffering); group=16 is the measured sweet spot for both dtypes.
``fused_attention`` adds a custom VJP (backward recomputes through the XLA
formulation) so the kernel is safe under differentiation when BERT is not
locked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)        # [L, D]
    k = k_ref[0, 0].astype(jnp.float32)        # [L, D]
    v = v_ref[0, 0].astype(jnp.float32)        # [L, D]
    bias = bias_ref[0, 0].astype(jnp.float32)  # [1, L]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                           # [L, L]
    s = s * scale + bias                        # bias broadcasts over rows
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _grouped_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, group: int,
                    heads: int, scale: float):
    """One program = a group of G rows with FULL [L, D] tiles (Mosaic
    requires the last block dims be full or 8/128-divisible; dh=64 head
    slices are not). Heads separate via lane masks: masking q's lanes to
    head h makes the full-width [L,D]x[D,L] dot equal that head's QKᵀ, and
    (P @ V) masked back to head-h lanes assembles the output in place —
    only 2-D dots and elementwise ops, which Mosaic always lowers."""
    G, L, D = q_ref.shape
    dh = D // heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // dh  # [1, D]

    bias2d = len(bias_ref.shape) == 3      # [G, L, L] segment bias

    def g_body(g, _):
        # dynamic indexing must go through the refs (pl.ds); dynamic_slice
        # on loaded values is not lowerable on TPU
        qg = q_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)   # [L, D]
        kg = k_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
        vg = v_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
        if bias2d:
            bg = bias_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)  # [L, L]
        else:
            bg = bias_ref[pl.ds(g, 1), :].astype(jnp.float32)        # [1, L]

        def h_body(h, acc):
            m = (lane == h).astype(jnp.float32)       # [1, D]
            s = jax.lax.dot_general(
                qg * m, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bg                            # [L, L]
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ctx = jnp.dot(p, vg, preferred_element_type=jnp.float32)
            return acc + ctx * m

        out = jax.lax.fori_loop(
            0, heads, h_body, jnp.zeros((L, D), jnp.float32)
        )
        o_ref[pl.ds(g, 1), :, :] = out[None].astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, g_body, 0)


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, group: int,
                   heads: int, scale: float):
    """Lane-packed variant of :func:`_grouped_kernel`: heads are processed
    in 128-lane bundles (``pack = 128 // dh`` heads per bundle, static
    slices at 128-lane alignment) instead of full-width masked dots. Per
    head that's a [L,128]x[128,L] QK dot and a [L,L]x[L,128] PV dot —
    2x the ideal attention FLOPs at dh=64 instead of the full-width
    kernel's 12x, with the same all-VMEM data flow (no [L,L] HBM traffic,
    no head transposes). Still only 2-D dots + elementwise ops.

    For sub-32-bit dtypes Mosaic can't prove the per-row ``pl.ds(g, 1)``
    dim-0 slice is sublane-aligned ("index in dimension 0 is a multiple
    of 8"), so narrow inputs statically unroll the group loop over a
    whole-block f32 read instead (value slicing with static indices)."""
    G, L, D = q_ref.shape
    dh = D // heads
    pack = max(1, 128 // dh)        # heads per 128-lane bundle
    bundle = dh * pack              # 128 when dh divides 128
    n_bundles = heads // pack
    assert heads % pack == 0 and D == bundle * n_bundles
    # lane-id within a bundle -> head slot [1, bundle]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, bundle), 1) // dh
    bias2d = len(bias_ref.shape) == 3      # [G, L, L] segment bias
    static_rows = q_ref.dtype.itemsize < 4
    if static_rows:
        q_all = q_ref[...].astype(jnp.float32)    # [G, L, D]
        k_all = k_ref[...].astype(jnp.float32)
        v_all = v_ref[...].astype(jnp.float32)
        b_all = bias_ref[...].astype(jnp.float32)  # [G, L] | [G, L, L]
        out_rows = []

    def g_body(g, _):
        if static_rows:
            qg, kg, vg = q_all[g], k_all[g], v_all[g]          # [L, D]
            bg = b_all[g] if bias2d else b_all[g][None]        # [L,L]|[1,L]
        elif bias2d:
            qg = q_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            kg = k_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            vg = v_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            bg = bias_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)  # [L, L]
        else:
            qg = q_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            kg = k_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            vg = v_ref[pl.ds(g, 1), :, :][0].astype(jnp.float32)
            bg = bias_ref[pl.ds(g, 1), :].astype(jnp.float32)  # [1, L]

        outs = []
        for b in range(n_bundles):                 # static unroll
            sl = slice(b * bundle, (b + 1) * bundle)
            qb, kb, vb = qg[:, sl], kg[:, sl], vg[:, sl]
            ctx = jnp.zeros((L, bundle), jnp.float32)
            for h in range(pack):                  # static unroll
                m = (slot == h).astype(jnp.float32)          # [1, bundle]
                s = jax.lax.dot_general(
                    qb * m, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + bg                               # [L, L]
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - mx)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                pv = jnp.dot(p, vb, preferred_element_type=jnp.float32)
                ctx = ctx + pv * m
            outs.append(ctx)
        out = jnp.concatenate(outs, axis=-1)                 # [L, D]
        if static_rows:
            out_rows.append(out)
            return 0
        o_ref[pl.ds(g, 1), :, :] = out[None].astype(o_ref.dtype)
        return 0

    if static_rows:
        for g in range(group):
            g_body(g, 0)
        o_ref[...] = jnp.stack(out_rows).astype(o_ref.dtype)
    else:
        jax.lax.fori_loop(0, group, g_body, 0)


@functools.partial(
    jax.jit, static_argnames=("heads", "interpret", "group", "packed")
)
def grouped_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_rows: jax.Array,
    heads: int,
    group: int = 16,
    interpret: bool = False,
    packed: bool = True,
) -> jax.Array:
    """Fused MHA in model layout: q/k/v [B, L, H*dh], bias_rows either a
    [B, L] additive key mask or a [B, L, L] per-query additive bias (the
    sequence-packing segment mask). Returns [B, L, H*dh] in q's dtype.

    Grid = B/group programs of [group, L, D] tiles; heads unrolled in-kernel
    (``packed=True`` -> 128-lane head bundles, 2x-FLOP masked dots;
    ``packed=False`` -> the original full-width 12x-FLOP formulation).
    Designed for the short-L / huge-B regime where the XLA path loses ~20%
    of BERT time to head transposes and score-tensor HBM traffic.
    """
    B, L, D = q.shape
    dh = D // heads
    scale = 1.0 / (dh ** 0.5)
    G = min(group, B)
    pad = (-B) % G
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        q, k, v, bias_rows = zpad(q), zpad(k), zpad(v), zpad(bias_rows)
    Bp = B + pad

    use_packed = packed and 128 % dh == 0 and heads % max(1, 128 // dh) == 0
    kernel = _packed_kernel if use_packed else _grouped_kernel
    dot_width = dh * max(1, 128 // dh) if use_packed else D
    blk = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = (
        pl.BlockSpec((G, L, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        if bias_rows.ndim == 3
        else pl.BlockSpec((G, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(kernel, group=G, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bp, L, D), q.dtype),
        grid=(Bp // G,),
        in_specs=[blk, blk, blk, bias_spec],
        out_specs=blk,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * heads * L * L * dot_width,
            bytes_accessed=4 * Bp * L * D * 2,
            transcendentals=Bp * heads * L * L,
        ),
    )(q, k, v, bias_rows)
    return out[:B] if pad else out


def attention_rows_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, bias_rows: jax.Array, heads: int
) -> jax.Array:
    """Model-layout XLA attention: q/k/v [B, L, H*dh], bias_rows [B, L]
    key mask or [B, L, L] per-query bias. The einsum formulation the BERT
    module uses (`modeling.py:233-246` semantics), kept here as the
    differentiation/CPU reference for :func:`fused_attention`."""
    B, L, D = q.shape
    dh = D // heads
    qh = q.reshape(B, L, heads, dh)
    kh = k.reshape(B, L, heads, dh)
    vh = v.reshape(B, L, heads, dh)
    s = jnp.einsum(
        "blhd,bmhd->bhlm", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    if bias_rows.ndim == 3:
        s = s + bias_rows[:, None].astype(jnp.float32)
    else:
        s = s + bias_rows[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    ctx = jnp.einsum(
        "bhlm,bmhd->blhd", p, vh, preferred_element_type=jnp.float32
    )
    return ctx.reshape(B, L, D).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_rows: jax.Array,
    heads: int,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry point for :func:`grouped_attention`: forward
    runs the Pallas kernel; backward recomputes through
    :func:`attention_rows_xla` (Mosaic kernels have no autodiff rule).
    The recompute costs one XLA attention in the bwd pass only — free when
    BERT is locked (the usual conf), and still a net win unlocked since
    the fwd pass dominates at these shapes."""
    return grouped_attention(
        q, k, v, bias_rows, heads=heads, group=group, interpret=interpret
    )


def _fused_attention_fwd(q, k, v, bias_rows, heads, group, interpret):
    out = fused_attention(q, k, v, bias_rows, heads, group, interpret)
    return out, (q, k, v, bias_rows)


def _fused_attention_bwd(heads, group, interpret, res, g):
    q, k, v, bias_rows = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: attention_rows_xla(q_, k_, v_, b_, heads),
        q, k, v, bias_rows,
    )
    return vjp(g.astype(q.dtype))


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def tp_kernel_ok(heads: int, dh: int, tp: int) -> bool:
    """True when the packed kernel stays efficient with ``heads/tp`` local
    heads per shard: the head count must divide over tp AND each shard's
    bundle must still fill 128 lanes (otherwise the fallback full-width
    kernel's 12x-FLOP dots would eat the tp win — force the einsum path
    instead)."""
    if tp <= 1:
        return True
    if heads % tp:
        return False
    pack = max(1, 128 // dh) if 128 % dh == 0 else 1
    return (heads // tp) % pack == 0


def sharded_fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_rows: jax.Array,
    heads: int,
    mesh,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fused_attention` under a (dp, tp) ``jax.sharding.Mesh``.

    GSPMD cannot partition a Pallas custom call — left alone it would
    all-gather the operands and replicate the kernel on every device. This
    wrapper makes the partitioning explicit with ``jax.shard_map``: the
    batch axis splits over ``dp`` and the feature axis over ``tp``. Feature
    sharding is head-aligned (Dense output features are head-major, so tp
    shard t owns heads [t*H/tp, (t+1)*H/tp)), which makes heads
    embarrassingly parallel: each shard runs the packed kernel on its local
    head bundle with zero collectives — the math being sharded is the
    reference's per-head attention (`Models/Bert/modeling.py:233-246`).

    Requires ``heads % tp == 0`` (gate with :func:`tp_kernel_ok`) and the
    global batch divisible by dp. Composes with jit: inside a jitted
    program the shard_map consumes the already-(dp, tp)-sharded QKV
    activations without resharding.
    """
    from jax.sharding import PartitionSpec as P

    axes = dict(mesh.shape)
    dp = axes.get("dp", 1)
    tp = axes.get("tp", 1)
    B, L, D = q.shape
    assert B % dp == 0, f"batch {B} not divisible by dp={dp}"
    assert heads % tp == 0 and D % tp == 0, (
        f"heads={heads}/D={D} not divisible by tp={tp}"
    )
    local_heads = heads // tp
    dp_ax = "dp" if dp > 1 else None
    tp_ax = "tp" if tp > 1 else None
    spec3 = P(dp_ax, None, tp_ax)
    spec2 = P(dp_ax) if bias_rows.ndim == 3 else P(dp_ax, None)

    def local(q_, k_, v_, b_):
        return fused_attention(
            q_, k_, v_, b_, local_heads, group, interpret
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec2),
        out_specs=spec3,
        # pallas_call's ShapeDtypeStruct carries no varying-mesh-axes
        # annotation; the output vma is fully determined by out_specs here
        check_vma=False,
    )(q, k, v, bias_rows)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """q/k/v: [B, H, L, D]; bias: [B, 1, 1, L] additive mask (-10000 at
    padding). Returns [B, H, L, D] float32 context."""
    B, H, L, D = q.shape
    scale = 1.0 / (D ** 0.5)
    bias2 = bias.reshape(B, 1, 1, L)

    grid = (B, H)
    blk = lambda idx_fn: pl.BlockSpec(
        (1, 1, L, D), idx_fn, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), jnp.float32),
        grid=grid,
        in_specs=[
            blk(lambda b, h: (b, h, 0, 0)),
            blk(lambda b, h: (b, h, 0, 0)),
            blk(lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, L), lambda b, h: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=blk(lambda b, h: (b, h, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * L * L * D,
            bytes_accessed=4 * B * H * L * D * 4 + B * L * 4,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v, bias2)
