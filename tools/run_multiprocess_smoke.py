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
# fp32 reduction-order drift across mesh layouts: the hybrid 2x4 mesh
# lowers the gradient psum as ICI reduce-scatter + DCN all-reduce +
# all-gather while the flat 8-device mesh reduces in one order, and two
# Adamax updates (|g|-normalized) amplify the per-step drift (observed
# 1.6e-5..4.9e-5 rel across runs). Both RANKS must still agree exactly.
RTOL = 2e-4


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

    # checkpoint save path: rank 0 assembles every leaf from LOCAL shards
    # (params replicated over the cross-host dp axis; tp confined to this
    # host) — zero DCN all-gathers; other ranks write nothing
    from ruart_tpu.parallel.distributed import fetch_fallback_count

    ckpt_path = os.path.join(datadir, "ckpt.npz")
    trainer.save(ckpt_path, epoch=1)
    save_fallbacks = fetch_fallback_count()

    # direct correctness of the local-shard assembly: for every param leaf,
    # the local-first fetch must be BITWISE equal to the all-gather fetch
    # (same global array, two transport paths). Collective — all ranks run.
    fetch_exact = True
    if role != "single":
        import numpy as np
        from jax.experimental import multihost_utils

        from ruart_tpu.parallel.distributed import fetch_local_first

        for leaf in jax.tree.leaves(
            (trainer.state.params, trainer.state.opt_state)
        ):
            local = fetch_local_first(leaf, materialize=True)
            gathered = np.asarray(
                multihost_utils.process_allgather(leaf, tiled=True)
            )
            if local.shape != gathered.shape or not (local == gathered).all():
                fetch_exact = False

    result = {
        "role": role,
        "loss": float(trainer.train_loss.avg),
        "updates": int(trainer.updates),
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
        "mesh": dict(trainer.mesh.shape) if trainer.mesh is not None else None,
        "ckpt_path": ckpt_path if os.path.exists(ckpt_path) else None,
        "ckpt_fallbacks": save_fallbacks,
        "fetch_exact": fetch_exact,
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

    # checkpoint contract: rank 0 wrote, rank 1 did not, NO all-gather
    # fallbacks fired (every leaf local-shard-assembled), and the saved
    # params match the single-process run's checkpoint numerically
    by_role = {r["role"]: r for r in results}
    if by_role["0"]["ckpt_path"] is None:
        print("FAIL: rank 0 did not write a checkpoint", file=sys.stderr)
        ok = False
    if by_role["1"]["ckpt_path"] is not None:
        print("FAIL: rank 1 wrote a checkpoint (only rank 0 should)",
              file=sys.stderr)
        ok = False
    for r in results:
        if r["ckpt_fallbacks"] != 0:
            print(
                f"FAIL: rank {r['role']} used {r['ckpt_fallbacks']} "
                "all-gather fallbacks saving (params should be locally "
                "reconstructible)", file=sys.stderr,
            )
            ok = False
        if not r["fetch_exact"]:
            print(
                f"FAIL: rank {r['role']} local-shard assembly != "
                "process_allgather on some param leaf", file=sys.stderr,
            )
            ok = False
    if ok and single.get("ckpt_path") and by_role["0"]["ckpt_path"]:
        import numpy as np

        with np.load(single["ckpt_path"], allow_pickle=False) as a, \
                np.load(by_role["0"]["ckpt_path"], allow_pickle=False) as b:
            keys_a = set(a.files) - {"__meta__"}
            keys_b = set(b.files) - {"__meta__"}
            if keys_a != keys_b:
                print(f"FAIL: checkpoint key sets differ: "
                      f"{sorted(keys_a ^ keys_b)[:5]}", file=sys.stderr)
                ok = False
            else:
                # loose sanity only, params only: Adamax's first step is
                # lr*(1-b1)*sign(g) per element (u = |g| at step 1), so
                # elements whose true gradient is ~0 get topology-dependent
                # SIGN flips from fp32 reduction-order noise — observed
                # ~1e-3-absolute drift on weights after two updates, and
                # chaotic opt-moment values (skipped; their key set is
                # checked above and their save TRANSPORT is asserted
                # bitwise via fetch_exact). The single-vs-multi loss
                # equality (rel 2e-4) is the load-bearing check.
                for k in sorted(keys_a):
                    if k.startswith("opt/"):
                        continue
                    va, vb = np.asarray(a[k], np.float32), np.asarray(
                        b[k], np.float32)
                    if not np.allclose(va, vb, rtol=1e-2, atol=5e-3):
                        print(
                            f"FAIL: checkpoint leaf {k} differs "
                            f"(max|d|={np.abs(va - vb).max():.3e})",
                            file=sys.stderr,
                        )
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
