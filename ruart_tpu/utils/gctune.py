"""Generational-GC tuning for the allocation-heavy host pipeline.

The featurize/item-build/collate path allocates millions of small dicts
and lists per 256-batch; CPython's default gen-0 threshold (700) then
runs a cyclic collection every few hundred allocations. Measured on the
bench host: serving featurization 251 -> 98 ms median per 256 requests
just from raising the thresholds (the pipeline's objects are almost
entirely acyclic, so those collections find nothing).

Applied at entry points only (CLIs, InferenceEngine, bench) — a library
should not mutate process-global GC state on import. Opt out with the
``NO_GC_TUNE`` conf key.
"""

from __future__ import annotations

import gc

_THRESHOLDS = (100_000, 100, 100)


def tune_gc(opt=None) -> bool:
    """Raise the gen-0 collection threshold for host-pipeline throughput.
    Returns True when applied; respects the ``NO_GC_TUNE`` conf key
    (reference conf semantics: key *presence* disables)."""
    if opt is not None and "NO_GC_TUNE" in opt:
        return False
    gc.set_threshold(*_THRESHOLDS)
    return True
