#!/usr/bin/env python
"""A/B the Pallas grouped-attention kernel against the XLA einsum path.

Sweeps (dtype, group, packed) at the flagship shapes. This is the harness
behind the measurements in ops/attention.py's docstring (bf16 group=16:
2.66x XLA on v5e-1). Run on the TPU:

    python tools/bench_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence_timeit(f, *a, iters=20, warmup=3):
    for _ in range(warmup):
        o = f(*a)
    np.asarray(o[0, 0, :4])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(o[0, 0, :4])
    return (time.perf_counter() - t0) / iters


def main():
    from ruart_tpu.ops.attention import attention_rows_xla, grouped_attention

    H, dh = 12, 64
    D = H * dh
    for dt in (jnp.bfloat16, jnp.float32):
        for B, L in ((832, 30), (1600, 30), (64, 50)):
            ks = jax.random.split(jax.random.PRNGKey(0), 4)
            q = jax.random.normal(ks[0], (B, L, D), dt)
            k = jax.random.normal(ks[1], (B, L, D), dt)
            v = jax.random.normal(ks[2], (B, L, D), dt)
            mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(dt)
            mask = mask.at[:, 0].set(1)
            bias = (1 - mask) * -10000.0

            xla = jax.jit(
                lambda q, k, v, b: attention_rows_xla(q, k, v, b, H)
            )
            t_x = fence_timeit(xla, q, k, v, bias)
            line = f"{dt.__name__} [{B},{L}]: xla {t_x*1e3:.3f} ms"
            for group in (8, 16, 32):
                try:
                    t_p = fence_timeit(
                        lambda q, k, v, b: grouped_attention(
                            q, k, v, b, heads=H, group=group
                        ),
                        q, k, v, bias,
                    )
                    line += f" | g{group} {t_p*1e3:.3f} ({t_x/t_p:.2f}x)"
                except Exception as e:  # VMEM / Mosaic limits at big groups
                    line += f" | g{group} FAIL({type(e).__name__})"
            print(line)


if __name__ == "__main__":
    main()
