"""Moved to ruart_tpu.ops.phoc (kept as an import shim)."""
from ruart_tpu.ops.phoc import *  # noqa: F401,F403
from ruart_tpu.ops.phoc import encode_char_ids, phoc_batch_jit, phoc_from_char_ids  # noqa: F401
