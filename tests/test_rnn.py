import numpy as np
import jax
import jax.numpy as jnp
import torch

from ruart_tpu.models.fusion.rnn import BiLSTM, StackedBRNN, gather_last_state
from ruart_tpu.models.fusion.layers import whole_tensor_layer_norm


def _torch_lstm_params(t_lstm, reverse=False):
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": jnp.asarray(getattr(t_lstm, f"weight_ih_l0{sfx}").detach().numpy()),
        "w_hh": jnp.asarray(getattr(t_lstm, f"weight_hh_l0{sfx}").detach().numpy()),
        "b_ih": jnp.asarray(getattr(t_lstm, f"bias_ih_l0{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(t_lstm, f"bias_hh_l0{sfx}").detach().numpy()),
    }


def test_bilstm_matches_torch():
    torch.manual_seed(0)
    B, L, In, H = 3, 7, 10, 6
    t_lstm = torch.nn.LSTM(In, H, num_layers=1, bidirectional=True, batch_first=True)
    x = torch.randn(B, L, In)
    with torch.no_grad():
        t_out, _ = t_lstm(x)

    model = BiLSTM(hidden_size=H, bidirectional=True)
    params = {
        "params": {
            "fwd": _torch_lstm_params(t_lstm, reverse=False),
            "bwd": _torch_lstm_params(t_lstm, reverse=True),
        }
    }
    j_out = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


def test_unidirectional_lstm_matches_torch():
    torch.manual_seed(1)
    B, L, In, H = 2, 5, 8, 4
    t_lstm = torch.nn.LSTM(In, H, num_layers=1, bidirectional=False, batch_first=True)
    x = torch.randn(B, L, In)
    with torch.no_grad():
        t_out, _ = t_lstm(x)
    model = BiLSTM(hidden_size=H, bidirectional=False)
    params = {"params": {"fwd": _torch_lstm_params(t_lstm)}}
    j_out = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


def test_stacked_brnn_two_layers_matches_torch():
    """Two stacked torch LSTMs applied sequentially == StackedBRNN layers."""
    torch.manual_seed(2)
    B, L, In, H = 2, 6, 9, 5
    l0 = torch.nn.LSTM(In, H, bidirectional=True, batch_first=True)
    l1 = torch.nn.LSTM(2 * H, H, bidirectional=True, batch_first=True)
    x = torch.randn(B, L, In)
    with torch.no_grad():
        o0, _ = l0(x)
        o1, _ = l1(o0)

    model = StackedBRNN(hidden_size=H, num_layers=2, bidirectional=True)
    params = {
        "params": {
            "rnn_0": {
                "fwd": _torch_lstm_params(l0),
                "bwd": _torch_lstm_params(l0, reverse=True),
            },
            "rnn_1": {
                "fwd": _torch_lstm_params(l1),
                "bwd": _torch_lstm_params(l1, reverse=True),
            },
        }
    }
    out, layers = model.apply(
        params, jnp.asarray(x.numpy()), return_list=True
    )
    assert len(layers) == 2
    np.testing.assert_allclose(np.asarray(layers[0]), o0.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(layers[1]), o1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), o1.numpy(), atol=2e-5)


def test_whole_tensor_layer_norm_matches_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 4, 6)
    ref = torch.nn.functional.layer_norm(x, x.size())
    out = whole_tensor_layer_norm(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_gather_last_state():
    outputs = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    lengths = jnp.array([2, 4])
    picked = gather_last_state(outputs, lengths)
    np.testing.assert_array_equal(np.asarray(picked[0]), np.asarray(outputs[0, 1]))
    np.testing.assert_array_equal(np.asarray(picked[1]), np.asarray(outputs[1, 3]))
    # zero length -> position 0
    picked0 = gather_last_state(outputs, jnp.array([0, 1]))
    np.testing.assert_array_equal(np.asarray(picked0[0]), np.asarray(outputs[0, 0]))
