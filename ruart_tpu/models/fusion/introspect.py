"""Attention-map extraction (the reference's ``att_score`` surface).

The reference threads a ``return_score`` flag through the forward pass and
collects per-module alphas (`SDNet.py:253-258`, `Layers.py:292-295`). Here
every Attention module sows its alpha into the 'intermediates' collection,
so any apply can opt in without changing the forward signature.
"""

from __future__ import annotations

from typing import Any, Dict


def forward_with_attention(model, params, q, ocr, od, **kwargs):
    """Returns (scores, {module_path: alpha array}). Alphas cover every
    Attention instance (pre-align, deep attention levels, self attentions,
    OD→OCR and position attentions)."""
    scores, state = model.apply(
        params, q, ocr, od, mutable=["intermediates"], **kwargs
    )
    alphas: Dict[str, Any] = {}

    def walk(tree, path=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{path}[{i}]" if len(tree) > 1 else path)
        else:
            alphas[path] = tree

    inter = state.get("intermediates", {})
    walk(inter)
    alphas = {k: v for k, v in alphas.items() if k.endswith("alpha") or "alpha[" in k}
    return scores, alphas
