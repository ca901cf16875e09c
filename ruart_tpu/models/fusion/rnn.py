"""LSTM stacks as `lax.scan` (TPU-native BiLSTM).

The reference runs cuDNN LSTMs over fully padded sequences — no packing, no
mask gating (`Models/Layers.py:156-180`: ``self.rnns[i](rnn_input)[0]``).
We reproduce those exact semantics: the scan consumes every (possibly
padded) timestep; callers that need length-aware outputs (multi2one last
state) gather by index afterwards (`Models/SDNet.py:298-318`).

TPU mapping: the input projection ``x @ W_ihᵀ + b`` for all timesteps is one
large MXU matmul done outside the scan; the scan body contains only the
[B,H]x[H,4H] recurrent matmul and elementwise gate math. Parameters use the
torch layout/gate order (W [4H, in], gates i,f,g,o) so checkpoint conversion
is a straight copy and torch-parity tests are layout-free.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ruart_tpu.models.fusion.layers import dropout_fn, whole_tensor_layer_norm

# lax.scan unroll factor for the LSTM recurrences. The fusion stack is
# scan-latency-bound (hundreds of sequential [B,H]x[H,4H] steps per batch);
# unrolling trades loop-dispatch overhead for program size with IDENTICAL
# math (same op sequence, no reassociation). Env-tunable for device A/Bs.
import os

_SCAN_UNROLL = int(os.environ.get("RUART_SCAN_UNROLL", 1))


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class LSTMLayer(nn.Module):
    """Single-direction LSTM over [B, L, In] -> [B, L, H].

    Torch-compatible parameterization: ``w_ih [4H, In]``, ``w_hh [4H, H]``,
    ``b_ih``/``b_hh [4H]``, gate order (input, forget, cell, output).
    """

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        H = self.hidden_size
        in_dim = x.shape[-1]
        scale = 1.0 / H**0.5
        w_ih = self.param("w_ih", _uniform_init(scale), (4 * H, in_dim))
        w_hh = self.param("w_hh", _uniform_init(scale), (4 * H, H))
        b_ih = self.param("b_ih", _uniform_init(scale), (4 * H,))
        b_hh = self.param("b_hh", _uniform_init(scale), (4 * H,))

        # One big MXU matmul for all timesteps.
        pre = (
            jnp.einsum("bli,gi->blg", x, w_ih, preferred_element_type=jnp.float32)
            + b_ih
            + b_hh
        )
        pre = jnp.swapaxes(pre, 0, 1)  # [L, B, 4H] time-major for scan

        w_hh_t = w_hh.T  # [H, 4H]

        def step(carry, gates_t):
            h, c = carry
            gates = gates_t + jnp.dot(
                h, w_hh_t, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        h0 = jnp.zeros((B, H), dtype=pre.dtype)
        c0 = jnp.zeros((B, H), dtype=pre.dtype)
        _, ys = jax.lax.scan(
            step, (h0, c0), pre, reverse=self.reverse, unroll=_SCAN_UNROLL
        )
        return jnp.swapaxes(ys, 0, 1)  # [B, L, H]


class LSTMParams(nn.Module):
    """Parameter holder with the torch LSTM layout (shared by the fused
    bidirectional scan and checkpoint conversion)."""

    hidden_size: int

    @nn.compact
    def __call__(self, in_dim: int):
        H = self.hidden_size
        scale = 1.0 / H**0.5
        return (
            self.param("w_ih", _uniform_init(scale), (4 * H, in_dim)),
            self.param("w_hh", _uniform_init(scale), (4 * H, H)),
            self.param("b_ih", _uniform_init(scale), (4 * H,)),
            self.param("b_hh", _uniform_init(scale), (4 * H,)),
        )


class BiLSTM(nn.Module):
    """One (optionally bidirectional) LSTM layer; concat of directions.

    Both directions run in ONE `lax.scan` (the backward direction consumes
    the time-reversed sequence with its own weights, stacked on a leading
    direction axis) — identical math to two separate scans, half the scan
    launches. The fusion stack is scan-latency-bound on TPU (many short
    sequences), so this matters more than MXU width.
    """

    hidden_size: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.bidirectional:
            return LSTMLayer(self.hidden_size, reverse=False, name="fwd")(x)

        H = self.hidden_size
        in_dim = x.shape[-1]

        # parameter tree stays identical to the two-module layout
        # (rnn_i/fwd/w_ih, rnn_i/bwd/w_ih, ...)
        fwd = LSTMParams(H, name="fwd")(in_dim)
        bwd = LSTMParams(H, name="bwd")(in_dim)
        w_ih = jnp.stack([fwd[0], bwd[0]])                            # [2,4H,I]
        w_hh = jnp.stack([fwd[1], bwd[1]])                            # [2,4H,H]
        bias = jnp.stack([fwd[2] + fwd[3], bwd[2] + bwd[3]])          # [2,4H]

        xs = jnp.stack([x, x[:, ::-1]], axis=0)                       # [2,B,L,I]
        pre = (
            jnp.einsum("dbli,dgi->dblg", xs, w_ih, preferred_element_type=jnp.float32)
            + bias[:, None, None, :]
        )
        pre = jnp.moveaxis(pre, 2, 0)                                 # [L,2,B,4H]
        w_hh_t = jnp.swapaxes(w_hh, 1, 2)                             # [2,H,4H]

        def step(carry, gates_t):
            h, c = carry                                              # [2,B,H]
            gates = gates_t + jnp.einsum(
                "dbh,dhg->dbg", h, w_hh_t, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        h0 = jnp.zeros((2, B, H), dtype=pre.dtype)
        _, ys = jax.lax.scan(step, (h0, h0), pre, unroll=_SCAN_UNROLL)  # [L,2,B,H]
        fwd = jnp.moveaxis(ys[:, 0], 0, 1)                            # [B,L,H]
        bwd = jnp.moveaxis(ys[:, 1], 0, 1)[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class StackedBRNN(nn.Module):
    """Multi-layer BiLSTM with per-layer outputs (`Layers.py:124-180`).

    * inter-layer dropout on each layer's input when training
    * optional whole-tensor layer norm after each layer (``ln=True`` call
      arg, matching the reference's always-LN=True call sites)
    * ``concat_layers`` concatenates per-layer outputs on the feature axis
    """

    hidden_size: int
    num_layers: int
    bidirectional: bool = True
    concat_layers: bool = False
    dropout_p: float = 0.0
    variational: bool = True

    @property
    def output_size(self) -> int:
        width = self.hidden_size * (2 if self.bidirectional else 1)
        return width * self.num_layers if self.concat_layers else width

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        ln: bool = False,
        return_list: bool = False,
    ):
        hiddens: List[jax.Array] = [x]
        for i in range(self.num_layers):
            rnn_input = hiddens[-1]
            if self.dropout_p > 0:
                rnn_input = dropout_fn(
                    self, rnn_input, self.dropout_p, self.variational, deterministic
                )
            out = BiLSTM(self.hidden_size, self.bidirectional, name=f"rnn_{i}")(
                rnn_input
            )
            if ln:
                out = whole_tensor_layer_norm(out)
            hiddens.append(out)
        output = (
            jnp.concatenate(hiddens[1:], axis=-1)
            if self.concat_layers
            else hiddens[-1]
        )
        if return_list:
            return output, hiddens[1:]
        return output


def gather_last_state(outputs: jax.Array, lengths: jax.Array) -> jax.Array:
    """outputs [B, L, D], lengths [B] -> output at index len-1 per row
    (the multi2one last-valid-state pick, `SDNet.py:303-311`). Rows with
    length 0 return position 0."""
    idx = jnp.maximum(lengths.astype(jnp.int32) - 1, 0)
    return jnp.take_along_axis(
        outputs, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
