"""Trainer: end-to-end orchestration (train / eval / test-inference).

The TPU-native equivalent of `Models/SDNetTrainer.py` + `BaseTrainer.py`:
run-folder allocation (``conf~/run_<N>``), conf snapshotting, preprocessing
bootstrap, model/optimizer setup, the training loop with its 1500-batch
eval cadence and 30-batch log cadence, best-ANLS/ACC checkpointing, exact
sampler-offset resume, and the parity-gated ``predict_for_test`` path that
writes ``submission.json``.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Dict, Optional

import jax
import msgpack
import numpy as np

from ruart_tpu.core.config import Config
from ruart_tpu.data.collate import Collator
from ruart_tpu.data.dataset import VQADataset
from ruart_tpu.data.pipeline import batch_iterator, device_put_batch, prefetch
from ruart_tpu.data.preprocess import Preprocessor
from ruart_tpu.eval.evaluator import evaluate, write_submission
from ruart_tpu.data.sampler import VQASampler
from ruart_tpu.models.bert.config import BertConfig
from ruart_tpu.models.fusion.model import RUArtModel, install_embeddings
from ruart_tpu.models.fusion.spec import ModelSpec
from ruart_tpu.text.phoc import build_phoc_batch
from ruart_tpu.text.wordpiece import WordPieceTokenizer, build_demo_vocab
from ruart_tpu.train import checkpoint as ckpt
from ruart_tpu.train.loss import make_loss_fn
from ruart_tpu.train.optim import make_optimizer, make_row_pinner
from ruart_tpu.train.train_step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from ruart_tpu.utils.meters import AverageMeter

log = logging.getLogger(__name__)


def resolve_bert_artifacts(opt: Dict) -> tuple:
    """(tokenizer_file, model_dir) conf values, honoring the BERT_LARGE
    redirection to the *_large_* keys (`VQA_Dataset.py:49-58`,
    `Bert/Bert.py:26-28`). Falls back to the base keys when the large
    ones are absent so partial confs stay usable."""
    if "BERT_LARGE" in opt:
        tok = opt.get("BERT_large_tokenizer_file", opt.get("BERT_tokenizer_file"))
        mdl = opt.get("BERT_large_model_file", opt.get("BERT_model_file"))
        return tok, mdl
    return opt.get("BERT_tokenizer_file"), opt.get("BERT_model_file")


class Trainer:
    def __init__(self, cfg: Config, bert_config: Optional[BertConfig] = None):
        self.cfg = cfg
        self.opt = cfg.opt
        # multi-host: connect to the distributed runtime before any JAX
        # call sees the device topology (no-op without the
        # `coordinator_address` conf key — parallel/distributed.py)
        from ruart_tpu.parallel.distributed import maybe_initialize_distributed

        maybe_initialize_distributed(self.opt)
        self.opt.setdefault("datadir", ".")
        self.opt["FEATURE_FOLDER"] = os.path.join(
            self.opt["datadir"], "./source/data/", str(self.opt.get("source_dir", "")), ""
        ) if "FEATURE_FOLDER" not in self.opt else self.opt["FEATURE_FOLDER"]
        self._n_proc = 1  # refreshed in setup_model
        self.preproc = Preprocessor(cfg)
        self.bert_config = bert_config
        self.save_folder: Optional[str] = None
        self.train_loss = AverageMeter()
        self.updates = 0
        self.best_anls = -1.0
        self.best_acc = -1.0
        self.best_anls_batch = -1
        self.best_acc_batch = -1
        self._load_fixed_answers()
        self._load_image_features()

    # -- folders (`BaseTrainer.py:48-69`) --------------------------------
    def get_save_folder(self, is_train: bool) -> str:
        if is_train:
            runid = 1
            while True:
                folder = os.path.join(self.opt["datadir"], "conf~", f"run_{runid}")
                if not os.path.exists(folder):
                    os.makedirs(folder)
                    self.save_folder = folder
                    log.info("Saving logs, model and evaluation in %s", folder)
                    return folder
                runid += 1
        else:
            p = "/".join(str(self.opt["MODEL_PATH"]).split("/")[:2])
            self.save_folder = os.path.join(self.opt["datadir"], p)
            os.makedirs(self.save_folder, exist_ok=True)
            return self.save_folder

    def save_conf_copy(self):
        conf_file = self.opt.get("confFile")
        if conf_file and os.path.isfile(conf_file) and self.save_folder:
            shutil.copyfile(conf_file, os.path.join(self.save_folder, "conf_copy"))

    # -- fixed answers (`SDNetTrainer.py:253-288`) -----------------------
    def _load_fixed_answers(self):
        self.fixed_answers_entry = None
        self.fixed_answers = None
        if "fixed_answers" not in self.opt:
            return
        folder = self.opt["fixed_answers_folder"]
        with open(os.path.join(folder, "fixed_answers_4000.txt")) as f:
            fixed = [line.strip().lower() for line in f if line.strip()]
        label_path = os.path.join(
            folder, "TRAIN_VAL_fixed_answers_label.msgpack"
        )
        labels = {}
        if os.path.exists(label_path):
            with open(label_path, "rb") as f:
                labels = msgpack.unpack(f, raw=False, strict_map_key=False)
        phoc = None
        if "phoc" in self.opt.get("ocr_embedding", ""):
            phoc = build_phoc_batch(fixed)
        self.fixed_answers = fixed
        self.fixed_answers_entry = {
            "fixed_answers": fixed,
            "fixed_answers_len": len(fixed),
            "fixed_answers_label": labels,
            "fixed_answers_phoc": phoc,
        }
        self.opt["fixed_answers_len"] = len(fixed)

    def _load_image_features(self):
        """`SDNetTrainer.load_image_features:178-207` hook."""
        self.image_features = None
        if "img_feature" in self.opt:
            from ruart_tpu.data.image_features import load_image_features

            self.image_features = load_image_features(self.opt)
            log.info("Image features have been loaded")

    # -- model setup (`SDNetTrainer.setup_model:290-328`) ----------------
    def setup_model(self, embeddings: Dict[str, np.ndarray]):
        cfg = self.cfg

        # tokenizer: real BERT vocab when configured, demo vocab otherwise.
        # BERT_LARGE redirects both artifact keys; the 1024/24 model dims
        # come from ModelSpec.from_config -> BertConfig.large_uncased.
        tok_file, self._bert_dir = resolve_bert_artifacts(self.opt)
        if tok_file:
            tok_path = os.path.join(self.opt["datadir"], str(tok_file))
            if os.path.isfile(tok_path):
                self.tokenizer = WordPieceTokenizer.from_file(tok_path)
            else:
                log.warning("BERT vocab %s missing; using demo vocab", tok_path)
                self.tokenizer = WordPieceTokenizer(build_demo_vocab())
        else:
            self.tokenizer = WordPieceTokenizer(build_demo_vocab())

        # the BERT embedding table must cover every tokenizer id (an OOB
        # gather silently fills NaN under XLA)
        if self.bert_config is not None and self.bert_config.vocab_size < len(
            self.tokenizer.vocab
        ):
            import dataclasses

            self.bert_config = dataclasses.replace(
                self.bert_config, vocab_size=len(self.tokenizer.vocab)
            )

        self.spec = ModelSpec.from_config(cfg, self.bert_config)
        # INT8_BERT is an inference-time transform: the stateful model
        # (init / checkpoints / training) stays fp32, and predict_for_test
        # quantizes the loaded tree + swaps in a quantized eval program
        # (ops/quant.py). Keeping quant out of the stateful spec means
        # checkpoints and converters never see int8 params.
        self._int8_eval = bool(
            self.spec.use_bert
            and self.spec.bert is not None
            and self.spec.bert.quant == "int8"
        )
        if self._int8_eval:
            import dataclasses

            self.spec = dataclasses.replace(
                self.spec,
                bert=dataclasses.replace(self.spec.bert, quant="none"),
            )
        self.model = RUArtModel(self.spec)
        self.collator = Collator(cfg)

        from ruart_tpu.data.synthetic import make_synthetic_batch

        q, ocr, od, _ = make_synthetic_batch(self.spec, cfg, batch_size=1)
        # jitted: eager flax init dispatches one device RPC per op, which is
        # minutes over a remote-TPU tunnel; one compiled program is one trip
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(cfg.seed),
            *(jax.tree.map(lambda x: x, t) for t in (q, ocr, od)),
        )
        params = install_embeddings(
            params,
            glove=embeddings.get("glove_embedding"),
            fasttext=embeddings.get("fast_embedding"),
            phoc=embeddings.get("phoc_embedding"),
        )
        # load pretrained BERT weights when the conf points at them
        bert_dir = self._bert_dir
        if bert_dir:
            bert_path = os.path.join(self.opt["datadir"], str(bert_dir))
            cfg_json = os.path.join(bert_path, "bert_config.json")
            bin_path = os.path.join(bert_path, "pytorch_model.bin")
            if os.path.isfile(cfg_json) and os.path.isfile(bin_path):
                from ruart_tpu.models.bert.convert import load_bert_params

                _, bert_params = load_bert_params(bert_path)
                tree = dict(params["params"])
                tree["Bert"] = bert_params["params"]
                params = {**params, "params": tree}
                log.info("Loaded pretrained BERT from %s", bert_path)

        tune_partial = (
            int(self.opt["tune_partial"]) if "TUNE_PARTIAL" in self.opt else None
        )
        self.tx = make_optimizer(
            str(self.opt.get("optimizer", "#")),
            float(self.opt["lr"]) if "lr" in self.opt else None,
            float(self.opt.get("grad_clipping", 10)),
            params,
            self.spec,
            tune_partial is not None,
        )
        self.loss_fn = make_loss_fn(str(self.opt.get("loss", "BCE_D1")))

        # mesh execution: when several devices are visible and the batch
        # divides the data axis, shard params (BERT tensor-parallel) and run
        # every step SPMD — the TPU-native replacement for the reference's
        # 2-GPU ModelParallel split (`SDNetTrainer.py:296-301`). Decided
        # BEFORE the step programs are built so the attention impl is
        # final at the single build site below.
        self.mesh = None
        self._batch_sharding = None
        self._h2d_slim = bool(int(cfg.opt.get("h2d_slim", 1)))
        self._n_proc = jax.process_count()
        n_dev = len(jax.devices())
        if n_dev > 1 and "no_mesh" not in self.opt:
            from ruart_tpu.parallel.distributed import make_hybrid_mesh
            from ruart_tpu.parallel.mesh import auto_mesh, batch_pspec, shard_params

            tp_req = int(self.opt.get("tensor_parallel", 1))
            if self._n_proc > 1:
                # hybrid ICI x DCN mesh: tp inside each host, dp host-major
                # over DCN. Every host runs this same program and collates
                # the FULL global batch (deterministic: same items, same
                # collator), then feeds its process_batch_slice of the
                # per-sample keys (`_device_put`). Dedup/pack tables, bucket
                # picks, and cand_sel are data-dependent but derived from
                # the same global batch on every host, so shapes and
                # contents agree — they ride along as replicated
                # batch-global arrays instead of being disabled.
                mesh = make_hybrid_mesh(tp=tp_req)
            else:
                mesh = auto_mesh(tp=tp_req)
            dp = mesh.shape["dp"]
            if cfg.batch_size % dp == 0:
                self.mesh = mesh
                params = shard_params(params, mesh)
                self._batch_sharding = batch_pspec(mesh)
                log.info(
                    "Mesh execution: dp=%d tp=%d over %d devices",
                    dp, mesh.shape["tp"], n_dev,
                )
                if self.spec.bert is not None:
                    import dataclasses

                    from ruart_tpu.ops.attention import tp_kernel_ok

                    bert = self.spec.bert
                    dh = bert.hidden_size // bert.num_attention_heads
                    if bert.attention_impl == "auto" and not tp_kernel_ok(
                        bert.num_attention_heads, dh, mesh.shape["tp"]
                    ):
                        # this tp degree leaves shards whose head bundles
                        # can't fill the packed kernel's 128 lanes; the
                        # einsum path (natively GSPMD-shardable) is faster
                        # than the degraded kernel there
                        bert = dataclasses.replace(bert, attention_impl="xla")
                        log.info(
                            "tp=%d: BERT attention_impl forced to 'xla' "
                            "(head bundle does not pack at this tp degree)",
                            mesh.shape["tp"],
                        )
                    else:
                        # hand the mesh to the attention module so the
                        # Pallas kernel partitions explicitly via shard_map
                        # (GSPMD would replicate the custom call)
                        bert = dataclasses.replace(bert, mesh=mesh)
                    self.spec = dataclasses.replace(self.spec, bert=bert)
                    self.model = RUArtModel(self.spec)
            elif "ModelParallel" in self.opt:
                log.info(
                    "ModelParallel conf key noted; batch %d not divisible by "
                    "dp=%d, staying single-device", cfg.batch_size, dp,
                )

        row_pinner = make_row_pinner(params, self.spec, tune_partial)
        self.train_step = make_train_step(
            self.model, self.tx, self.loss_fn, row_pinner,
            debug_nans="DEBUG_NANS" in self.opt,
        )
        self.eval_step = make_eval_step(self.model, self.loss_fn)
        self.state = init_train_state(params, self.tx, cfg.seed)
        self.updates = 0

    def _device_put(self, batch):
        if self._batch_sharding is None:
            return batch
        if self._h2d_slim:
            from ruart_tpu.data.collate import slim_block

            q, ocr, od, gt, extra = batch
            batch = (slim_block(q), slim_block(ocr), slim_block(od), gt, extra)
        if self._n_proc > 1:
            # every host collated the full global batch (cheap, uniform
            # program); device arrays are assembled from each host's slice.
            # Batch-GLOBAL keys (dedup/pack tables, cand_sel) are identical
            # on every host and stay unsliced -> replicated.
            from ruart_tpu.data.collate import COMPACT_KEYS, DEDUP_KEYS
            from ruart_tpu.parallel.distributed import (
                make_global_batch,
                process_batch_slice,
            )

            global_keys = frozenset(DEDUP_KEYS + COMPACT_KEYS)
            q, ocr, od, gt, extra = batch
            sl = process_batch_slice(self.cfg.batch_size)
            cut = lambda t: {
                k: (v if k in global_keys else v[sl]) for k, v in t.items()
            }
            gq, gocr, god, ggt = make_global_batch(
                (cut(q), cut(ocr), cut(od), gt[sl] if gt is not None else None),
                self.mesh,
                n_global=self.cfg.batch_size,
                replicated_keys=global_keys,
            )
            return gq, gocr, god, ggt, extra
        return device_put_batch(batch, self._batch_sharding, slim=False)

    # -- checkpoint plumbing --------------------------------------------
    def _host_tree(self, tree):
        """Fetchable copy of a (possibly multi-host-sharded) tree: under
        multi-process execution params/opt-state shards live on other
        hosts' devices and np.asarray would fail. With tp confined to ICI
        and dp replicating params across hosts, every leaf is assembled
        from THIS host's addressable shards — zero DCN traffic on save;
        only leaves this host does not cover fall back to an all-gather
        (all hosts agree on which, so the collective cannot deadlock).
        Non-zero ranks skip materializing local-path leaves (rank 0 is
        the only writer)."""
        if self._n_proc <= 1:
            return tree
        from ruart_tpu.parallel.distributed import fetch_local_first

        rank0 = jax.process_index() == 0

        def fetch(x):
            return fetch_local_first(x, materialize=rank0)

        return jax.tree.map(fetch, tree)

    def save(self, filename: str, epoch: int = 0):
        params = self._host_tree(self.state.params)
        opt_leaves = self._host_tree(ckpt.opt_state_leaves(self.state.opt_state))
        if self._n_proc > 1 and jax.process_index() != 0:
            return  # every host gathers (collective), only rank 0 writes
        meta = {
            "updates": self.updates,
            "train_loss": self.train_loss.state_dict(),
            "epoch": epoch,
            "config": {k: v for k, v in self.opt.items() if _json_safe(v)},
        }
        ckpt.save_checkpoint(filename, params, opt_leaves, meta)

    def save_for_predict(self, filename: str):
        params = self._host_tree(self.state.params)
        if self._n_proc > 1 and jax.process_index() != 0:
            return
        ckpt.save_for_predict(filename, params, {"updates": self.updates})

    def load_model(self, path: str):
        params, opt_leaves, meta = ckpt.load_checkpoint(path, self.state.params)
        opt_state = ckpt.restore_opt_state(
            self.state.opt_state, opt_leaves,
            strict="LENIENT_OPT_RESUME" not in self.opt,
        )
        self.state = TrainState(
            params=jax.tree.map(jax.numpy.asarray, params),
            opt_state=opt_state,
            step=self.state.step,
            rng=self.state.rng,
        )
        self.updates = int(meta.get("updates", 0))
        if "train_loss" in meta:
            self.train_loss.load_state_dict(meta["train_loss"])
        log.info("Loading finished %s", path)

    # -- data loading ----------------------------------------------------
    def _load_split(self, label: str):
        path = os.path.join(
            self.opt["FEATURE_FOLDER"], f"{label}-preprocessed.msgpack"
        )
        with open(path, "rb") as f:
            return msgpack.unpack(f, raw=False, strict_map_key=False)

    def _dataset(self, label_data, mode: str) -> VQADataset:
        return VQADataset(
            label_data["data"], self.cfg, mode=mode, tokenizer=self.tokenizer,
            fixed_answers_entry=self.fixed_answers_entry,
            image_features=self.image_features,
        )

    # -- evaluation (`SDNetTrainer.evaluate:128-176`) --------------------
    def run_eval(self, dataset: VQADataset, batch_i: int, mode: str = "dev"):
        result = evaluate(
            self.eval_step, self.state.params, dataset, self.cfg,
            self.collator, fixed_answers=self.fixed_answers,
            device_put=self._device_put if self.mesh is not None else None,
        )
        if mode == "test":
            if self._n_proc <= 1 or jax.process_index() == 0:
                # every host decodes identical results (gathered scores);
                # one writes
                write_submission(
                    result["res"], self.save_folder, result["n"],
                    self.cfg.batch_size,
                )
            return result
        if mode == "dev" and self.save_folder:
            import json

            with open(os.path.join(self.save_folder, "save_res_last.json"), "w") as f:
                json.dump(result["save_res"], f, indent=2)
            if result["ANLS"] > self.best_anls:
                self.best_anls = result["ANLS"]
                self.best_anls_batch = batch_i
                self.save_for_predict(
                    os.path.join(self.save_folder, "ANLS_best_model.ckpt")
                )
            if result["ACC"] > self.best_acc:
                self.best_acc = result["ACC"]
                self.best_acc_batch = batch_i
                self.save_for_predict(
                    os.path.join(self.save_folder, "ACC_best_model.ckpt")
                )
        log.info(
            "Dataset: %s Batch: %7d ANLS: %.3f Best ANLS: %.3f Batch: %d "
            "ACC: %.3f Best ACC: %.3f Batch: %d",
            mode, batch_i, result["ANLS"], self.best_anls, self.best_anls_batch,
            result["ACC"], self.best_acc, self.best_acc_batch,
        )
        return result

    # -- training loop (`SDNetTrainer.train:52-126`) ---------------------
    def train(
        self,
        eval_every: int = 1500,
        log_every: int = 30,
    ):
        self.get_save_folder(is_train=True)
        self.save_conf_copy()
        self.preproc.ensure_preprocessed()
        vocab, char_vocab, embeddings = self.preproc.load_data()
        self.vocab = vocab
        self.setup_model(embeddings)

        if "RESUME" in self.opt and "MODEL_PATH" in self.opt:
            model_path = os.path.join(self.opt["datadir"], self.opt["MODEL_PATH"])
            if not os.path.exists(model_path):
                # the reference crashes inside torch.load here; failing loudly
                # beats silently training from scratch
                raise FileNotFoundError(f"RESUME checkpoint not found: {model_path}")
            self.load_model(model_path)

        if "DEBUG" in self.opt:
            # data-path dry run: iterate every split through the pipeline
            # without touching the model and dump length histograms
            # (`SDNetTrainer.py:67-79`; we return instead of assert False)
            from ruart_tpu.data.debug import dump_debug_scan

            for label in ("train", "val", "test"):
                try:
                    raw = self._load_split(label)
                except FileNotFoundError:
                    continue
                ds = self._dataset(raw, "test" if label == "test" else "train")
                paths = dump_debug_scan(ds, label, self.save_folder or ".")
                log.info("DEBUG scan %s -> %s", label, paths)
            log.info("DEBUG data dry run complete")
            return

        train_raw = self._load_split("train")
        val_raw = self._load_split("val")
        train_data = self._dataset(train_raw, "train")
        val_data = self._dataset(val_raw, "dev")

        batch_st = int(self.opt.get("batch_st", 0))
        sampler = VQASampler(
            len(train_data), self.cfg.batch_size, train=True,
            max_batch_number=int(self.opt.get("max_batch_num", 0)) or None,
            batch_st=batch_st,
            epoch=self.opt.get("epoch"),
        )
        it = batch_iterator(
            train_data, sampler, self.collator,
            num_workers=int(self.opt.get("num_worker", 0)),
        )
        start = time.time()
        batch_i = batch_st - 1
        # H2D in the prefetch thread on single-device too (device_put
        # releases the GIL; the consumer thread then only dispatches) —
        # the same default the evaluator uses
        put = (
            self._device_put if self.mesh is not None
            else (lambda b: device_put_batch(b, slim=self._h2d_slim))
        )
        # per-step device losses accumulate here and are fetched only at
        # log_every cadence: an unconditional per-step float(loss) is a
        # device->host sync that serializes dispatch against the donated
        # fused step (the reference's .item() habit, `SDNetTrainer.py:362`,
        # is exactly what a TPU loop must not copy). The finite-loss crash
        # therefore fires up to log_every-1 batches late — on a stale loss,
        # which is the right trade (the reference asserts immediately,
        # `SDNetTrainer.py:352-359`).
        pending: list = []

        def drain_losses(at_batch: int):
            if not pending:
                return None
            vals = np.asarray(jax.device_get(pending), dtype=np.float64)
            pending.clear()
            if not np.isfinite(vals).all():
                first = at_batch - len(vals) + 1 + int(
                    np.argmax(~np.isfinite(vals))
                )
                raise FloatingPointError(
                    f"loss is not finite at batch {first}"
                )
            for v in vals:
                self.train_loss.update(float(v), 1)
            return float(vals[-1])

        for q, ocr, od, gt, extra in prefetch(it, size=2, device_put=put):
            batch_i += 1
            if batch_i % eval_every == 0:
                drain_losses(batch_i - 1)
                self.run_eval(val_data, batch_i)
            self.state, loss = self.train_step(self.state, q, ocr, od, gt)
            self.updates += 1
            pending.append(loss)
            if "DEBUG_SDT" in self.opt:
                # opt-in per-step debug print (`SDNetTrainer.py:361-362`);
                # the float() here is a deliberate host sync — debug only
                print(float(loss), [t.get("q_id") for t in extra])
            if batch_i % log_every == 0:
                loss_val = drain_losses(batch_i)
                done = batch_i - batch_st + 1
                rate = (time.time() - start) / max(done, 1)
                remaining = rate * (len(sampler) - batch_st - done)
                log.info(
                    "updates[%6d] train loss[%8.5f / %8.5f] remaining[%ds]",
                    self.updates, self.train_loss.avg, loss_val, int(remaining),
                )
        drain_losses(batch_i)
        self.run_eval(val_data, batch_i)
        self.run_eval(train_data, batch_i, mode="train")
        log.info("Training over")

    # -- test inference (`SDNetTrainer.predict_for_test:231-251`) --------
    def predict_for_test(self):
        self.get_save_folder(is_train=False)
        self.preproc.ensure_preprocessed()
        vocab, char_vocab, embeddings = self.preproc.load_data()
        self.setup_model(embeddings)
        test_raw = self._load_split("test")
        if "RESUME" in self.opt and "MODEL_PATH" in self.opt:
            model_path = os.path.join(self.opt["datadir"], self.opt["MODEL_PATH"])
            if not os.path.exists(model_path):
                # a typo'd MODEL_PATH must not silently emit a random-weights
                # submission (reference crashes in torch.load, `:243-244`)
                raise FileNotFoundError(f"RESUME checkpoint not found: {model_path}")
            self.load_model(model_path)
        if self._int8_eval:
            self._apply_int8_eval()
        test_data = self._dataset(test_raw, "test")
        return self.run_eval(test_data, 0, mode="test")

    def _apply_int8_eval(self):
        """Swap the eval program + params to the weight-only-int8 encoder
        (INT8_BERT conf flag). Runs after checkpoint load so the quantized
        tree reflects the loaded fp32 weights."""
        import dataclasses

        from ruart_tpu.ops.quant import quantize_bert_params

        qspec = dataclasses.replace(
            self.spec, bert=dataclasses.replace(self.spec.bert, quant="int8")
        )
        self.eval_step = make_eval_step(RUArtModel(qspec), self.loss_fn)
        self.state = TrainState(
            params=quantize_bert_params(self.state.params),
            opt_state=self.state.opt_state,
            step=self.state.step,
            rng=self.state.rng,
        )
        log.info("INT8_BERT: encoder Dense layers quantized for inference")


def _json_safe(v) -> bool:
    return isinstance(v, (str, int, float, bool, type(None)))
