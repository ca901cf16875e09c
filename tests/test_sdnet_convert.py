"""Round-trip test for the SDNet torch-checkpoint converter: export our
params to reference naming, convert back, and verify the model computes
identically — guards the name mapping, transposes, and gate layout."""

import numpy as np
import jax
import jax.numpy as jnp

from ruart_tpu.models.fusion.convert import (
    convert_sdnet_state_dict,
    params_to_torch_state,
)
from ruart_tpu.train.checkpoint import flatten_tree, unflatten_tree

from tests.test_fusion_model import tiny_model_and_params


def test_roundtrip_conversion(shipped_conf_opt):
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(
        shipped_conf_opt
    )
    base = np.asarray(model.apply(params, q, ocr, od))

    torch_state = params_to_torch_state(params)
    assert any(k.endswith("weight_ih_l0") for k in torch_state)
    assert any(".scoring.linear.weight" in k for k in torch_state)

    converted_flat = convert_sdnet_state_dict(torch_state)
    init_flat = flatten_tree(params["params"])
    # every fusion param except BERT must round-trip
    missing = [
        k for k in init_flat
        if not k.startswith("Bert/") and k not in converted_flat
    ]
    assert not missing, f"unconverted params: {missing[:10]}"

    merged = dict(init_flat)
    for k, v in converted_flat.items():
        assert k in init_flat, f"unexpected key {k}"
        assert init_flat[k].shape == np.asarray(v).shape, k
        merged[k] = np.asarray(v)
    params2 = {"params": unflatten_tree(merged)}
    out = np.asarray(model.apply(params2, q, ocr, od))
    np.testing.assert_allclose(out, base, atol=1e-6)


def test_key_intersection_tolerance(shipped_conf_opt):
    """Extra torch keys (dead GRU cell, frozen-embedding buffers) are
    ignored, like the reference's load_model."""
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(
        shipped_conf_opt
    )
    torch_state = params_to_torch_state(params)
    torch_state["get_answer.rnn.weight_ih"] = np.zeros((3, 3), np.float32)
    torch_state["fixed_embedding_fast"] = np.zeros((5, 4), np.float32)
    converted = convert_sdnet_state_dict(torch_state)
    init_flat = flatten_tree(params["params"])
    for k in converted:
        assert k in init_flat


def test_dead_final_att_params_ignored(shipped_conf_opt):
    """A final_att checkpoint carries trainable params for the reference's
    image_feature_model, whose output is discarded (every use commented
    out, `SDNet.py:424-426`) — the converter must drop them and the merged
    tree must still compute identically (docs/PARITY.md deviation row)."""
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(
        shipped_conf_opt
    )
    base = np.asarray(model.apply(params, q, ocr, od))
    torch_state = params_to_torch_state(params)
    # the dead modules a final_att checkpoint would carry
    torch_state["image_feature_model.linear.weight"] = np.zeros(
        (8, 4), np.float32
    )
    torch_state["image_feature_model.linear.bias"] = np.zeros(8, np.float32)
    torch_state["ocr_final_model.linear.weight"] = np.zeros((8, 4), np.float32)
    converted = convert_sdnet_state_dict(torch_state)
    init_flat = flatten_tree(params["params"])
    merged = dict(init_flat)
    for k, v in converted.items():
        if k in init_flat and init_flat[k].shape == np.asarray(v).shape:
            merged[k] = np.asarray(v)
    out = np.asarray(
        model.apply({"params": unflatten_tree(merged)}, q, ocr, od)
    )
    np.testing.assert_allclose(out, base, atol=1e-6)
