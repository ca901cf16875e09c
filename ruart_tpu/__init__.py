"""ruart_tpu — a TPU-native (JAX / XLA / Pallas / pjit) text-VQA framework.

A from-scratch rebuild of the capabilities of xiaojino/RUArt (scene-text VQA:
answer a question about an image by scoring OCR-token candidates with a frozen
BERT encoder fused through a deep attention stack). The architecture is
TPU-first: fixed-shape length-bucketed batches, one jitted forward for
BERT + fusion + scoring, `lax.scan` BiLSTMs with precomputed gates, a
vectorized on-device PHOC op (with a C++ host oracle), and mesh-sharded
data/tensor-parallel execution over ICI.

Reference behavior citations use ``file:line`` relative to the upstream repo.
"""

__version__ = "0.1.0"
