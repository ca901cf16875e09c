"""Device kernels: Pallas fused attention, on-device PHOC encoding, and the
segment-pooling / layer-combine ops re-exported from the model package."""

from ruart_tpu.ops.attention import flash_attention
from ruart_tpu.ops.phoc import encode_char_ids, phoc_batch_jit, phoc_from_char_ids
