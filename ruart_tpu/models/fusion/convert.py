"""Reference SDNet torch checkpoint -> RUArtModel param tree.

Maps the reference's ``state_dict['network']`` names (`SDNetTrainer.save/
load_model:453-509`) onto this framework's tree:

* Linear ``weight`` [out, in] -> Dense ``kernel`` [in, out] (transposed)
* Embedding ``weight`` -> ``embedding``
* LSTM ``weight_ih_l0`` / ``..._reverse`` -> ``rnn_<i>/fwd|bwd/w_ih`` (torch
  gate order is preserved by our scan kernels, so no gate shuffling)
* AttentionScore ``diagonal`` [1, 1, H] -> [H]
* the dead GRU pointer cell (``get_answer.rnn.*``) and the frozen-embedding
  buffers are dropped, mirroring the reference's own key-intersection load.

Conversion is bidirectional (:func:`params_to_torch_state` exists for
round-trip testing and for exporting checkpoints back to the reference's
naming scheme).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ruart_tpu.models.bert.convert import convert_bert_state_dict


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


_EMBED_MAP = {
    "glove_embed.weight": "glove_embed/embedding",
    "fast_embed.weight": "fast_embed/embedding",
    "phoc_embed.weight": "phoc_embed/embedding",
    "pos_embedding.weight": "pos_embedding/embedding",
    "ent_embedding.weight": "ent_embedding/embedding",
}

_SCALAR_MAP = {
    "alphaBERT": "alphaBERT",
    "gammaBERT": "gammaBERT",
    "fixed_ocr_alpha": "fixed_ocr_alpha",
}

# attention modules: torch attribute -> our module path
_ATTN_MODULES = (
    "pre_align",
    "highlvl_self_att",
    "ques_self_attn",
    "od_ocr_attn",
    "position_attn",
)

# StackedBRNN modules: torch attribute -> (our path, num_layers key)
_RNN_MODULES = (
    "multi2one",
    "context_rnn",
    "ques_rnn",
    "high_lvl_ques_rnn",
    "high_lvl_context_rnn",
)

_LINEAR_HEADS = (
    ("ques_merger.linear", "ques_merger/linear"),
    ("get_answer.attn.linear", "get_answer/attn/linear"),
    ("get_answer.attn2.linear", "get_answer/attn2/linear"),
    ("get_answer.noanswer_linear", "get_answer/noanswer_linear"),
    ("get_answer.noanswer_w", "get_answer/noanswer_w"),
    ("get_answer.yes_linear", "get_answer/yes_linear"),
    ("get_answer.yes_w", "get_answer/yes_w"),
    ("get_answer.no_linear", "get_answer/no_linear"),
    ("get_answer.no_w", "get_answer/no_w"),
    ("get_answer.no_read_linear", "get_answer/no_read_linear"),
    ("get_answer.no_read_w", "get_answer/no_read_w"),
    ("fixed_ans_classifier", "fixed_ans_classifier"),
    ("img_fea2od", "img_fea2od"),
    ("ES_linear", "ES_linear"),
)


def convert_sdnet_state_dict(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """torch name -> flat '/'-joined param dict (subset present in ckpt)."""
    flat: Dict[str, np.ndarray] = {}

    def put_linear(torch_prefix: str, our_prefix: str):
        w = state.get(torch_prefix + ".weight")
        if w is not None:
            flat[our_prefix + "/kernel"] = _np(w).T
        b = state.get(torch_prefix + ".bias")
        if b is not None:
            flat[our_prefix + "/bias"] = _np(b)

    def put_lstm(torch_prefix: str, our_prefix: str, layer: int):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            key = f"{torch_prefix}.rnns.{layer}.weight_ih_l0{sfx}"
            if key not in state:
                continue
            base = f"{our_prefix}/rnn_{layer}/{direction}"
            flat[base + "/w_ih"] = _np(state[key])
            flat[base + "/w_hh"] = _np(
                state[f"{torch_prefix}.rnns.{layer}.weight_hh_l0{sfx}"]
            )
            flat[base + "/b_ih"] = _np(
                state[f"{torch_prefix}.rnns.{layer}.bias_ih_l0{sfx}"]
            )
            flat[base + "/b_hh"] = _np(
                state[f"{torch_prefix}.rnns.{layer}.bias_hh_l0{sfx}"]
            )

    def put_attention(torch_prefix: str, our_prefix: str):
        put_linear(torch_prefix + ".scoring.linear", our_prefix + "/scoring/linear")
        diag = state.get(torch_prefix + ".scoring.diagonal")
        if diag is not None:
            d = _np(diag).reshape(-1)
            if d.size > 1:  # trainable diagonal only (do_similarity stores a
                flat[our_prefix + "/scoring/diagonal"] = d  # frozen scalar)
            elif d.size == 1:
                pass

    for tname, ours in _EMBED_MAP.items():
        if tname in state:
            flat[ours] = _np(state[tname])
    for tname, ours in _SCALAR_MAP.items():
        if tname in state:
            v = _np(state[tname])
            flat[ours] = v.reshape(-1) if tname == "alphaBERT" else v

    for mod in _ATTN_MODULES:
        put_attention(mod, mod)
    for i in range(8):
        for mod in _RNN_MODULES:
            put_lstm(mod, mod, i)
        put_lstm("deep_attn.rnn", "deep_attn/rnn", i)
    for i in range(8):
        put_attention(f"deep_attn.int_attn_list.{i}", f"deep_attn/int_attn_{i}")
    for tname, ours in _LINEAR_HEADS:
        put_linear(tname, ours)
    put_attention("ES_ocr_att", "ES_ocr_att")

    # nested BERT (stored under Bert.bert_model.* in full checkpoints)
    bert_keys = {
        k[len("Bert.bert_model."):]: v
        for k, v in state.items()
        if k.startswith("Bert.bert_model.")
    }
    if bert_keys:
        n_layers = 1 + max(
            int(k.split(".")[2])
            for k in bert_keys
            if k.startswith("encoder.layer.")
        )
        bert_tree = convert_bert_state_dict(bert_keys, n_layers)
        from ruart_tpu.train.checkpoint import flatten_tree

        for k, v in flatten_tree(bert_tree).items():
            flat[f"Bert/{k}"] = v
    return flat


def load_sdnet_checkpoint(path: str, init_params: Dict[str, Any]) -> Dict[str, Any]:
    """Load a reference ``.pt`` checkpoint into an initialized param tree
    with the reference's key-intersection tolerance (`load_model:453-466`)."""
    import torch

    from ruart_tpu.train.checkpoint import flatten_tree, unflatten_tree

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["state_dict"]["network"]
    converted = convert_sdnet_state_dict(state)
    init_flat = flatten_tree(init_params["params"])
    merged = dict(init_flat)
    for k, v in converted.items():
        if k in init_flat and init_flat[k].shape == np.asarray(v).shape:
            merged[k] = np.asarray(v)
    return {**init_params, "params": unflatten_tree(merged)}


def params_to_torch_state(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping (fusion stack only) for round-trip tests/export."""
    from ruart_tpu.train.checkpoint import flatten_tree

    flat = flatten_tree(params["params"])
    out: Dict[str, np.ndarray] = {}
    inv_embed = {v: k for k, v in _EMBED_MAP.items()}
    for key, val in flat.items():
        if key.startswith("Bert/"):
            continue
        if key in inv_embed:
            out[inv_embed[key]] = val
            continue
        if key in ("alphaBERT", "gammaBERT", "fixed_ocr_alpha"):
            out[key] = val
            continue
        parts = key.split("/")
        if parts[-1] in ("w_ih", "w_hh", "b_ih", "b_hh"):
            # <mod...>/rnn_<i>/<dir>/<leaf>
            *mod, rnn_i, direction, leaf = parts
            tmod = ".".join(mod).replace("int_attn_", "int_attn_list.")
            layer = rnn_i.split("_")[1]
            sfx = "_reverse" if direction == "bwd" else ""
            name = {
                "w_ih": f"weight_ih_l0{sfx}",
                "w_hh": f"weight_hh_l0{sfx}",
                "b_ih": f"bias_ih_l0{sfx}",
                "b_hh": f"bias_hh_l0{sfx}",
            }[leaf]
            out[f"{tmod}.rnns.{layer}.{name}"] = val
        elif parts[-1] == "kernel":
            tname = ".".join(parts[:-1]).replace("int_attn_", "int_attn_list.")
            out[tname + ".weight"] = val.T
        elif parts[-1] == "bias":
            tname = ".".join(parts[:-1]).replace("int_attn_", "int_attn_list.")
            out[tname + ".bias"] = val
        elif parts[-1] == "diagonal":
            tname = ".".join(parts[:-1]).replace("int_attn_", "int_attn_list.")
            out[tname + ".diagonal"] = val.reshape(1, 1, -1)
    return out
