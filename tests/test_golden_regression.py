"""Golden-value regression: the tiny-spec model with a fixed seed must keep
producing the same scores across refactors (guards silent numerics drift in
any block — the composite analogue of the per-module parity tests).

If an INTENTIONAL math change invalidates these values, regenerate with:
    python -m tests.test_golden_regression
"""

import json
import os

import numpy as np

from tests.test_fusion_model import tiny_model_and_params

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_scores.json")


def _compute(shipped_conf_opt):
    cfg, spec, (q, ocr, od, gt), model, params = tiny_model_and_params(
        shipped_conf_opt
    )
    scores = np.asarray(model.apply(params, q, ocr, od), dtype=np.float64)
    return scores


def test_golden_scores(shipped_conf_opt):
    scores = _compute(shipped_conf_opt)
    with open(GOLDEN_PATH) as f:
        golden = np.asarray(json.load(f)["scores"])
    assert scores.shape == golden.shape
    np.testing.assert_allclose(scores, golden, atol=2e-5)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ruart_tpu.core.config import read_conf_lines
    from ruart_tpu.core.presets import STVQA_CONF

    opt = read_conf_lines(STVQA_CONF.splitlines())
    scores = _compute(opt)
    with open(GOLDEN_PATH, "w") as f:
        json.dump({"scores": scores.tolist()}, f)
    print(f"wrote {GOLDEN_PATH} shape={scores.shape}")
