#!/usr/bin/env python
"""Benchmark: throughput of the flagship model, host pipeline included.

Four configurations, each in a fresh subprocess (compiled executables and
live buffers otherwise fragment HBM between configs):

* ``e2e``   — the HEADLINE: offline test-set scoring exactly as
  `main_test.py` runs it (dataset item build -> collate -> prefetch ->
  jitted forward -> answer decode), measured through the real evaluator
  loop on preprocessed synthetic data at batch 256. This is the
  reference-comparable number (`SDNetTrainer.evaluate:128-176` — its
  featurization is offline msgpack, same as here).
* ``device`` — the jitted forward alone on pre-collated tensors (the
  round-1/2 headline), plus achieved TFLOP/s and MFU from XLA's own cost
  model: vs the self-measured ~110 TFLOP/s GEMM roofline of this chip and
  vs the 197 TFLOP/s bf16 v5e spec peak.
* ``serve`` — online serving via ``InferenceEngine.predict`` on raw
  requests: host featurization (spaCy-free tagging, wordpiece, n-gram
  synthesis) + collate overlapped against the device step. No reference
  equivalent (the reference has no serving path); reported for honesty
  about the full-host-path cost.
* ``train`` — fused train step (fwd+bwd+Adamax) at the shipped batch 16.

``vs_baseline`` compares the headline against the ACTUAL torch reference
model timed on CPU at batch 1 (the reference's deployment shape:
`main_test.py` single-process inference; see ``bench_reference.py``),
measured once and cached in ``.bench_baseline.json``.

Prints exactly one JSON line:
  {"metric": "questions_per_sec", "value": N, "unit": "q/s",
   "vs_baseline": R, "device_qps": ..., "serve_qps": ...,
   "train_step_ms": ..., "train_qps": ..., "tflops": ...,
   "mfu_vs_roofline": ..., "mfu_vs_peak": ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_baseline.json")
BASELINE_KEY = "torch_reference_b1_cpu_v1"
SELF_BASELINE_KEY = "stvqa_bertbase_b1_cpu_v1"  # legacy self-measured JAX-CPU


def _add_realistic_duplication(block, unique_frac: float, seed: int):
    """Rewrite candidate rows so only ~unique_frac of them are distinct —
    the shape real batches have (scene text repeats; the sentinel appears
    once per question; ES/n-gram sources overlap). Measured through the
    real pipeline on realistic synthetic data: OCR ~6-10% unique, OD
    ~0.5-2% (PROGRESS_NOTES.md round 2); the bench uses a CONSERVATIVE
    12.5% for OCR so the headline doesn't lean on the friendliest rate."""
    import numpy as np

    rng = np.random.RandomState(seed)
    B, N = block["bert"].shape[:2]
    pool = max(1, int(unique_frac * B * N))
    donors_b = rng.randint(0, B, size=pool)
    donors_n = rng.randint(0, N, size=pool)
    assign = rng.randint(0, pool, size=(B, N))
    for k in ("fasttext", "glove", "pos", "ent", "bert", "bert_offsets"):
        block[k][:] = block[k][donors_b[assign], donors_n[assign]]
    block["len"][:] = block["len"][donors_b[assign], donors_n[assign]]
    block["bert_mask"] = (block["bert"] != 0).astype(np.int32)


def build_flagship(batch_size: int, dtype: str = "float32", dedup: bool = True,
                   pack: bool = False, fuse: bool = True):
    import jax
    import jax.numpy as jnp

    from ruart_tpu.core.presets import stvqa_config
    from ruart_tpu.data.collate import Collator
    from ruart_tpu.data.synthetic import make_synthetic_batch
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec

    cfg = stvqa_config(vocab_size=5000, batch_size=batch_size)
    # the collator packs by default: set the key BOTH ways so the dense
    # A/B arm is genuinely dense
    cfg.opt["bert_pack"] = 1 if pack else 0
    # fused q/ocr/od encoder call (bert_fuse, default-on); the off arm
    # isolates the fusion win in A/Bs
    cfg.opt["bert_fuse"] = 1 if fuse else 0
    spec = ModelSpec.from_config(cfg, BertConfig(dtype=dtype))
    model = RUArtModel(spec)
    q, ocr, od, _ = make_synthetic_batch(spec, cfg, batch_size, seed=0)
    _add_realistic_duplication(ocr, 0.125, seed=1)
    _add_realistic_duplication(od, 0.03, seed=2)
    coll = Collator(cfg)
    # question-row packing (q_pack, default-on): attach exactly as the
    # Collator does for every real batch — rides the pack flag so the
    # dense A/B arm stays genuinely dense
    if pack and coll.q_pack and coll.dedup_frac > 0:
        B, Lqb = q["bert"].shape
        coll._add_dedup(q, B, 1, Lqb, frac=1.0)
        if "bert_inverse" in q:
            q["bert_inverse"] = q["bert_inverse"].reshape(B)
    if dedup:
        # attach bert_unique/bert_inverse exactly as the default Collator
        # does for every real batch (bert_dedup_frac defaults to 0.25)
        for block in (ocr, od):
            B, N, Lb = block["bert"].shape
            coll._add_dedup(block, B, N, Lb)
    # candidate-row compaction (cand_compact, default-on) is independent of
    # dedup: attach cand_sel exactly as the Collator does for every real
    # batch, and report whether it actually attached so an A/B arm can't
    # silently benchmark the dense grid while being labeled compact
    for name, block in (("ocr", ocr), ("od", od)):
        B, N = block["bert"].shape[:2]
        coll._add_compact(block, B, N)
        if "cand_sel" not in block:
            print(
                f"# compact: cand_sel did NOT attach for {name} "
                f"(R={int(block['num'].sum())} of {B * N} rows)",
                file=sys.stderr,
            )
    q, ocr, od = (
        {k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)
    )
    # jit the init: eager flax init dispatches one RPC per op over the axon
    # tunnel (minutes); one compiled program is a single round trip
    params = jax.jit(model.init)(jax.random.PRNGKey(0), q, ocr, od)

    def fn(params, q, ocr, od):
        return model.apply(params, q, ocr, od, deterministic=True)

    return jax.jit(fn), params, (q, ocr, od)


def measure(fn, params, batch, iters: int = 10, warmup: int = 2) -> float:
    """Throughput with a forced device->host fetch as the completion fence
    (under the axon tunnel, block_until_ready returns before the device
    finishes; fetching output bytes is the only reliable barrier)."""
    import numpy as np

    q, ocr, od = batch
    for _ in range(warmup):
        np.asarray(fn(params, q, ocr, od))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, q, ocr, od)
    np.asarray(out)
    dt = time.perf_counter() - t0
    batch_size = q["glove"].shape[0]
    return batch_size * iters / dt


def build_corpus(cfg, n: int, seed: int = 0, with_answers: bool = False):
    """Synthetic preprocessed dataset at realistic candidate counts
    (~50-100 OCR candidates per question after n-gram/ES merge, natural
    string duplication from a bounded scene-text vocabulary)."""
    from ruart_tpu.data.dataset import VQADataset
    from ruart_tpu.data.preprocess import Preprocessor
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab

    raw = make_synthetic_raw_dataset(
        n, seed=seed, n_ocr_range=(15, 30), n_es=40, with_answers=with_answers
    )
    pre = Preprocessor(cfg)
    data0 = pre._process_data(raw["data"][: min(n, 128)])
    pre.train_vocab = pre._build_vocab(data0)
    data = pre._process_data(raw["data"])
    pre._assign_ids(data)
    tok = WordPieceTokenizer(build_demo_vocab())
    ds = VQADataset(
        data, cfg, mode="train" if with_answers else "test", tokenizer=tok
    )
    return ds, tok, pre


def build_corpus_model(batch_size: int, dtype: str, n: int, seed: int = 0,
                       with_answers: bool = False, pack: bool = False):
    """(cfg, dataset, collator, model, params) driven by REAL pipeline
    items (not make_synthetic_batch tensors)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ruart_tpu.core.presets import stvqa_config
    from ruart_tpu.data.collate import Collator
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.models.fusion.model import RUArtModel
    from ruart_tpu.models.fusion.spec import ModelSpec

    cfg = stvqa_config(
        vocab_size=5000, batch_size=batch_size,
        preprocess_ocr_name="ocr_PMTD_ASTER,ES_ocr",
        preprocess_od_name="OD_bottom-up",
    )
    cfg.opt["bert_pack"] = 1 if pack else 0
    root = tempfile.mkdtemp()
    cfg.opt["datadir"] = root
    cfg.opt["FEATURE_FOLDER"] = root + "/features"
    ds, tok, pre = build_corpus(cfg, n, seed=seed, with_answers=with_answers)
    spec = ModelSpec.from_config(cfg, BertConfig(dtype=dtype))
    model = RUArtModel(spec)
    coll = Collator(cfg)
    q, ocr, od, gt, extra = coll([ds[i] for i in range(batch_size)])
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        *({k: jnp.asarray(v) for k, v in t.items()} for t in (q, ocr, od)),
    )
    return cfg, ds, tok, pre, spec, model, coll, params


def get_baseline() -> float:
    cache = {}
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if BASELINE_KEY in cache:
        return float(cache[BASELINE_KEY])
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_reference.py")],
        capture_output=True, text=True, timeout=3600,
    )
    qps = None
    for line in proc.stdout.splitlines():
        if line.startswith("TORCH_BASELINE_QPS="):
            qps = float(line.split("=", 1)[1])
    if qps is None:
        raise RuntimeError(
            f"baseline subprocess failed:\n{proc.stdout}\n{proc.stderr}"
        )
    cache[BASELINE_KEY] = qps
    try:
        with open(CACHE, "w") as f:
            json.dump(cache, f)
    except OSError:
        pass
    return qps


# ---------------------------------------------------------------------------
# Subprocess measurement bodies (one mode per process)
# ---------------------------------------------------------------------------

DEVICE_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
from ruart_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import json
from bench import build_flagship, measure

fn, params, batch = build_flagship(
    batch_size={bs}, dtype={dt!r}, pack={pack})
# log the attached artifact shapes so a bench number can be attributed
# to its exact program signature (bucket picks, dedup fallbacks and
# compaction state all change the compiled program; a profiler A/B must
# match these to be comparable)
q, ocr, od = batch
for name, blk in (("ocr", ocr), ("od", od)):
    sig = {{
        k: tuple(v.shape) for k, v in sorted(blk.items())
        if k.startswith("bert_") or k == "cand_sel"
    }}
    print(f"# {{name}} signature: {{sig}}", file=sys.stderr)
qps = measure(fn, params, batch, iters=8, warmup=2)
out = {{"qps": qps}}
try:
    # fn is already jitted: lowering it again hits the in-process trace
    # cache and the persistent compile cache (a fresh jit wrapper would
    # recompile the whole program just for the cost model)
    ca = fn.lower(params, q, ocr, od).compile().cost_analysis()
    flops = float(ca.get("flops", 0.0)) if hasattr(ca, "get") else 0.0
    if flops > 0:
        out["tflops"] = flops / ({bs} / qps) / 1e12
except Exception as e:
    print("# cost_analysis failed:", e, file=sys.stderr)
print("RESULT=" + json.dumps(out))
"""

E2E_SNIPPET = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from ruart_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import build_corpus_model
from ruart_tpu.eval.evaluator import evaluate
from ruart_tpu.train.train_step import make_eval_step

from ruart_tpu.utils.gctune import tune_gc
tune_gc()
N = {n}
cfg, ds, tok, pre, spec, model, coll, params = build_corpus_model(
    {bs}, {dt!r}, N, pack={pack})
step = make_eval_step(model)
evaluate(step, params, ds, cfg, coll)   # compile + cache warm
# median of 3 timed passes: a single pass over the tunnel swings +-15%
qps = []
for _ in range(3):
    t0 = time.perf_counter()
    r = evaluate(step, params, ds, cfg, coll)
    qps.append(r["n"] / (time.perf_counter() - t0))
print("RESULT=" + json.dumps({{"qps": sorted(qps)[1]}}))
"""

SERVE_SNIPPET = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, {repo!r})
from ruart_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import build_corpus_model
from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
from ruart_tpu.serve import InferenceEngine

N = {n}
cfg, ds, tok, pre, spec, model, coll, params = build_corpus_model(
    {bs}, {dt!r}, {bs}, pack={pack})
engine = InferenceEngine(cfg, spec, params, pre.train_vocab, tok)
raw = make_synthetic_raw_dataset(N, seed=3, n_ocr_range=(15, 30), n_es=40,
                                 with_answers=False)["data"]
reqs = [
    {{"question": d["question"], "image_width": d["image_width"],
      "image_height": d["image_height"], "ocr": d["ocr_PMTD_ASTER"],
      "od": d["OD_bottom-up"], "es": d["ES_ocr"]}}
    for d in raw
]
engine.predict(reqs[: {bs}])    # compile + warm
# median of 3 timed passes: a single pass over the tunnel swings +-15%
qps = []
for _ in range(3):
    t0 = time.perf_counter()
    res = engine.predict(reqs)
    dt = time.perf_counter() - t0
    assert all(r is not None for r in res)
    qps.append(len(reqs) / dt)
print("RESULT=" + json.dumps({{"qps": sorted(qps)[1]}}))
"""

TRAIN_SNIPPET = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, {repo!r})
from ruart_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
from bench import build_corpus_model
from ruart_tpu.train.loss import make_loss_fn
from ruart_tpu.train.optim import make_optimizer, make_row_pinner
from ruart_tpu.train.train_step import init_train_state, make_train_step

from ruart_tpu.utils.gctune import tune_gc
tune_gc()
BS = {bs}
cfg, ds, tok, pre, spec, model, coll, params = build_corpus_model(
    BS, {dt!r}, max(BS, 64), with_answers=True, pack={pack})
tx = make_optimizer("#", 1e-3, 10.0, params, spec, True)
step = make_train_step(model, tx, make_loss_fn("BCE_D1"),
                       make_row_pinner(params, spec, 1000))
items = [ds[i % len(ds)] for i in range(BS)]
q, ocr, od, gt, extra = coll(items)
import jax.numpy as jnp
q, ocr, od = ({{k: jnp.asarray(v) for k, v in t.items()}} for t in (q, ocr, od))
gt = jnp.asarray(gt)
state = init_train_state(params, tx, 0)
tflops_per_step = None
try:
    # XLA's own cost model for the fused fwd+bwd+Adamax program: the
    # train-side counterpart of the device mode's MFU so training perf is
    # held to the same roofline standard as eval
    ca = step.lower(state, q, ocr, od, gt).compile().cost_analysis()
    flops = float(ca.get("flops", 0.0)) if hasattr(ca, "get") else 0.0
    if flops > 0:
        tflops_per_step = flops / 1e12
except Exception as e:
    print("# train cost_analysis failed:", e, file=sys.stderr)
for _ in range(3):
    state, loss = step(state, q, ocr, od, gt)
float(loss)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, loss = step(state, q, ocr, od, gt)
lv = float(loss)
dt = time.perf_counter() - t0
assert np.isfinite(lv)
out = {{"step_ms": dt / iters * 1e3, "qps": BS * iters / dt}}
if tflops_per_step:
    out["tflops"] = tflops_per_step / (dt / iters)
print("RESULT=" + json.dumps(out))
"""


CPU_PREAMBLE = (
    'import jax; jax.config.update("jax_platforms", "cpu")\n'
)


# Global wall-clock budget. The driver runs bench.py under an external
# timeout (round 4's run was killed at rc 124 with NOTHING printed after
# ~50 min of cold compiles over the tunnel): bench must always emit its
# one JSON line before that. Two defenses:
#   * every mode subprocess is capped by the REMAINING budget, and modes
#     are ordered headline-first so the important numbers land early;
#   * SIGTERM/SIGINT (what `timeout` sends) triggers an immediate partial
#     emit of whatever has been measured so far.
_T0 = time.monotonic()
_BUDGET = float(os.environ.get("RUART_BENCH_BUDGET_S", 2700))
_EMITTED = False
_OUT: dict = {}


def _remaining() -> float:
    return _BUDGET - (time.monotonic() - _T0)


def _emit(out: dict, baseline: float | None):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    headline = out.get("e2e_qps") or out.get("device_qps") or 0.0
    out["value"] = round(headline, 3)
    out["vs_baseline"] = round(headline / baseline, 3) if baseline else None
    print(json.dumps(out), flush=True)


def _run_mode(snippet: str, timeout: int = 2400, cpu: bool = False, **fmt):
    # never let one mode eat past the global budget (leave 30 s to emit)
    timeout = max(1, min(timeout, int(_remaining() - 30)))
    if timeout < 60:
        print("# bench mode skipped: budget exhausted", file=sys.stderr)
        return None
    code = snippet.format(repo=REPO, **fmt)
    if cpu:
        code = CPU_PREAMBLE + code
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print("# bench mode timed out", file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT="):
            return json.loads(line.split("=", 1)[1])
    print(f"# bench mode failed:\n{proc.stderr[-800:]}", file=sys.stderr)
    return None


def _probe_accelerator(timeout: int = 240) -> bool:
    """True when a non-CPU JAX backend answers within ``timeout`` seconds.
    The axon TPU tunnel can go down for an hour+ mid-session, and then
    ``jax.devices()`` HANGS rather than erroring — every bench subprocess
    would burn its full timeout. Probe once, cheaply, in a subprocess."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT=' + jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False
    for line in proc.stdout.splitlines():
        if line.startswith("PLAT="):
            return line.split("=", 1)[1] != "cpu"
    return False


# Self-measured GEMM roofline of this chip (8192^3 bf16, round 1) and the
# v5e spec sheet bf16 peak.
ROOFLINE_TFLOPS = 110.0
PEAK_TFLOPS = 197.0


def main():
    import signal

    baseline = get_baseline()
    sys.path.insert(0, REPO)
    out = _OUT
    out.update({"metric": "questions_per_sec", "unit": "q/s"})
    # all host-path numbers (e2e/serve) are bound by this machine's core
    # count — real TPU hosts have dozens (the num_worker pool scales there)
    out["host_cores"] = os.cpu_count()

    # if the driver's outer `timeout` fires anyway, emit what we have
    def _on_term(signum, frame):
        print(f"# signal {signum}: emitting partial result", file=sys.stderr)
        _emit(out, baseline)
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # the axon tunnel can be down for an hour+: probe cheaply, wait a
    # little, then fall back to an honest (labeled) CPU measurement at
    # reduced shapes rather than hang every mode to its timeout
    cpu = False
    probes = int(os.environ.get("RUART_BENCH_PROBE_RETRIES", 2))
    for attempt in range(probes):
        if _probe_accelerator():
            break
        print(
            f"# accelerator probe {attempt + 1}/{probes} failed",
            file=sys.stderr,
        )
        if attempt < probes - 1:
            time.sleep(min(300, max(0, _remaining() - 1200)))
    else:
        cpu = True
        out["platform"] = "cpu_fallback"
        print("# accelerator unreachable: CPU fallback numbers",
              file=sys.stderr)
    bs, n, train_bs = (16, 64, 4) if cpu else (256, 1024, 16)

    # --- device, shipped config (pack+compact+fuse all default-on) -----
    # Per-mode timeout CAPS (tightened after a slow-tunnel day let the
    # serve mode burn ~18 min and starve every later mode): a mode that
    # can't finish inside its cap on a warm cache is broken/slow-tunnel,
    # and losing ONE mode's number beats losing all the ones behind it.
    pack = 1
    device = _run_mode(DEVICE_SNIPPET, bs=bs, dt="bfloat16", pack=1, cpu=cpu,
                       timeout=1500)
    if device is None:
        # packed program failed on this platform: fall back to dense
        device = _run_mode(DEVICE_SNIPPET, bs=bs, dt="bfloat16", pack=0,
                           cpu=cpu, timeout=1200)
        pack = 0
    if device:
        out["device_qps"] = round(device["qps"], 3)
        out["pack"] = pack
        if "tflops" in device and not cpu:
            out["tflops"] = round(device["tflops"], 2)
            out["mfu_vs_roofline"] = round(device["tflops"] / ROOFLINE_TFLOPS, 4)
            out["mfu_vs_peak"] = round(device["tflops"] / PEAK_TFLOPS, 4)

    # --- e2e offline scoring: the HEADLINE — run it early ---------------
    e2e = _run_mode(E2E_SNIPPET, bs=bs, dt="bfloat16", n=n, pack=pack,
                    cpu=cpu, timeout=1200)
    if e2e is None and pack:
        e2e = _run_mode(E2E_SNIPPET, bs=bs, dt="bfloat16", n=n, pack=0,
                        cpu=cpu, timeout=1200)
    if e2e:
        out["e2e_qps"] = round(e2e["qps"], 3)

    # shipped-batch train BEFORE serve: it is cheap, and the serve mode is
    # the one that goes long on a slow tunnel (signature warmup burst)
    train = _run_mode(TRAIN_SNIPPET, bs=train_bs, dt="bfloat16", pack=pack,
                      cpu=cpu, timeout=600)
    if train is None and pack:
        train = _run_mode(TRAIN_SNIPPET, bs=train_bs, dt="bfloat16", pack=0,
                          cpu=cpu, timeout=600)
    if train:
        out["train_step_ms"] = round(train["step_ms"], 2)
        out["train_qps"] = round(train["qps"], 3)

    serve = _run_mode(SERVE_SNIPPET, bs=bs, dt="bfloat16", n=n, pack=pack,
                      cpu=cpu, timeout=900)
    if serve is None and pack:
        serve = _run_mode(SERVE_SNIPPET, bs=bs, dt="bfloat16", n=n, pack=0,
                          cpu=cpu, timeout=600)
    if serve:
        out["serve_qps"] = round(serve["qps"], 3)

    # flagship-batch train step (the throughput shape): train-side TFLOP/s
    # + MFU against the same rooflines as the eval path
    if not cpu:
        train_big = _run_mode(TRAIN_SNIPPET, bs=bs, dt="bfloat16", pack=pack,
                              timeout=900)
        if train_big:
            out["train256_step_ms"] = round(train_big["step_ms"], 2)
            out["train256_qps"] = round(train_big["qps"], 3)
            if "tflops" in train_big:
                out["train_tflops"] = round(train_big["tflops"], 2)
                out["train_mfu"] = round(
                    train_big["tflops"] / ROOFLINE_TFLOPS, 4
                )
                out["train_mfu_vs_peak"] = round(
                    train_big["tflops"] / PEAK_TFLOPS, 4
                )

    # --- dense-device A/B arm: informative only, last in line -----------
    if pack and _remaining() > 400:
        dense = _run_mode(DEVICE_SNIPPET, bs=bs, dt="bfloat16", pack=0,
                          cpu=cpu, timeout=600)
        if dense:
            out["device_qps_packed"] = out.get("device_qps")
            out["device_qps_dense"] = round(dense["qps"], 3)

    # headline: the end-to-end offline-scoring number (host pipeline
    # included); device-only is the fallback if the e2e mode failed
    _emit(out, baseline)


if __name__ == "__main__":
    main()
