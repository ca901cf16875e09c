#!/usr/bin/env python
"""Actual multi-process (multi-host) smoke on CPU — no real hosts needed.

Proves the trainer's multi-host path END TO END, not just its construction
logic: spawns two subprocesses that each call ``jax.distributed.initialize``
(localhost coordinator), build the hybrid ICIxDCN mesh over 2 hosts x 4
virtual CPU devices, collate the full global batch, feed their
``process_batch_slice`` (dedup/pack/compact tables riding along replicated),
and run the REAL ``Trainer.train`` for one epoch. A third subprocess runs
the identical training single-process on 8 virtual devices; the parent
asserts the mean train losses match.

The reference has no distributed runtime at all (SURVEY §2.3: its only
multi-device feature is the 2-GPU `.to(device)` split,
`Models/SDNetTrainer.py:296-301`); this validates the TPU-native
replacement on the topology CI can actually run.

    python tools/run_multiprocess_smoke.py          # parent: run everything

Exit 0 + one ``RESULT={...}`` JSON line on success.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RTOL = 2e-5  # fp32 psum/reduction-order drift across mesh layouts


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child(role: str, datadir: str, out_path: str, coordinator: str) -> None:
    """Runs inside a subprocess with JAX_PLATFORMS/XLA_FLAGS already set."""
    # the JAX_PLATFORMS env var is ignored when the experimental axon TPU
    # plugin is installed (it wins platform selection); pin via config
    # BEFORE any backend initializes, exactly like tests/conftest.py
    import jax

    jax.config.update("jax_platforms", "cpu")

    import msgpack

    from ruart_tpu.core.config import Config, read_conf_lines
    from ruart_tpu.core.presets import STVQA_CONF, TINY_OVERRIDES
    from ruart_tpu.data.synthetic import make_synthetic_raw_dataset
    from ruart_tpu.models.bert.config import BertConfig
    from ruart_tpu.train.trainer import Trainer

    for label, n, seed in (("train", 16, 0), ("val", 8, 1)):
        raw = make_synthetic_raw_dataset(n, seed=seed)
        with open(os.path.join(datadir, f"{label}.msgpack"), "wb") as f:
            msgpack.pack(raw, f)

    opt = read_conf_lines(STVQA_CONF.splitlines())
    opt.update(TINY_OVERRIDES)
    opt.update(
        {
            "Task": "train,val",
            "datadir": datadir,
            "FEATURE_FOLDER": os.path.join(datadir, "features"),
            "train_FILE": "train.msgpack",
            "val_FILE": "val.msgpack",
            "preprocess_ocr_name": "ocr_PMTD_ASTER,ES_ocr",
            "preprocess_od_name": "OD_bottom-up",
            "batch_size": 8,
            "epoch": 1,
            # force the dedup/pack artifacts even at tiny shapes so the
            # multi-host path exercises replicated batch-global tables
            "bert_dedup_frac": 1,
            "bert_pack": 1,
            # variational dropout masks depend on the RNG partitioning of
            # the [B, 1, D] bernoulli draws; keep the equality check about
            # the DATA path, not RNG layout
            "dropout_p": 0,
            "dropout_emb": 0,
        }
    )
    if role != "single":
        opt.update(
            {
                "coordinator_address": coordinator,
                "num_processes": 2,
                "process_id": int(role),
            }
        )
    if role != "single":
        from ruart_tpu.parallel.distributed import maybe_initialize_distributed

        assert maybe_initialize_distributed(opt), "distributed init skipped"
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 8, jax.device_count()

    trainer = Trainer(Config(opt), bert_config=BertConfig.tiny(vocab_size=64))
    trainer.train(eval_every=10 ** 6, log_every=10 ** 6)

    result = {
        "role": role,
        "loss": float(trainer.train_loss.avg),
        "updates": int(trainer.updates),
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
        "mesh": dict(trainer.mesh.shape) if trainer.mesh is not None else None,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        _child(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
        return 0

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    root = tempfile.mkdtemp(prefix="ruart_mp_smoke_")

    def spawn(role: str, n_local_devices: int):
        datadir = os.path.join(root, f"role_{role}")
        os.makedirs(datadir, exist_ok=True)
        out_path = os.path.join(datadir, "result.json")
        env = dict(os.environ)
        env.update(
            {
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": (
                    f"--xla_force_host_platform_device_count={n_local_devices}"
                ),
                # cross-process CPU collectives (psum/all-gather over
                # localhost stand in for DCN)
                "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
                "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
            }
        )
        proc = subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "child", role, datadir, out_path, coordinator,
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        return proc, out_path

    # single-process oracle: same data, same seeds, 8 virtual devices
    single_proc, single_out = spawn("single", 8)
    single_stdout, single_stderr = single_proc.communicate(timeout=1200)
    if single_proc.returncode != 0:
        print(single_stdout[-2000:], file=sys.stderr)
        print(single_stderr[-4000:], file=sys.stderr)
        print("FAIL: single-process oracle crashed", file=sys.stderr)
        return 1

    # the actual 2-process run: 2 hosts x 4 devices
    workers = [spawn(str(rank), 4) for rank in range(2)]
    outs = []
    failed = False
    for (proc, out_path), rank in zip(workers, range(2)):
        stdout, stderr = proc.communicate(timeout=1200)
        if proc.returncode != 0:
            print(stdout[-2000:], file=sys.stderr)
            print(stderr[-4000:], file=sys.stderr)
            print(f"FAIL: worker {rank} crashed", file=sys.stderr)
            failed = True
        else:
            outs.append(out_path)
    if failed:
        return 1

    with open(single_out) as f:
        single = json.load(f)
    results = []
    for out_path in outs:
        with open(out_path) as f:
            results.append(json.load(f))

    ok = True
    for r in results:
        if r["process_count"] != 2 or r["global_devices"] != 8:
            print(f"FAIL: bad topology in {r}", file=sys.stderr)
            ok = False
        if r["mesh"] != single["mesh"]:
            print(f"FAIL: mesh mismatch {r['mesh']} vs {single['mesh']}",
                  file=sys.stderr)
            ok = False
        if r["updates"] != single["updates"]:
            print(f"FAIL: update-count mismatch {r} vs {single}",
                  file=sys.stderr)
            ok = False
        rel = abs(r["loss"] - single["loss"]) / max(abs(single["loss"]), 1e-12)
        if rel > RTOL:
            print(
                f"FAIL: loss mismatch rank{r['role']} {r['loss']} vs "
                f"single {single['loss']} (rel {rel:.2e})", file=sys.stderr,
            )
            ok = False
    if results[0]["loss"] != results[1]["loss"]:
        print("FAIL: ranks disagree on the global loss", file=sys.stderr)
        ok = False
    if not ok:
        return 1
    print(
        "RESULT="
        + json.dumps(
            {
                "single_loss": single["loss"],
                "multiproc_loss": results[0]["loss"],
                "updates": single["updates"],
                "mesh": single["mesh"],
                "processes": 2,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
