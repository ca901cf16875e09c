"""Train CLI (reference `main.py`).

    python main.py --command train --conf_file conf_stvqa [--log_file name]

The conf file uses the reference format; `datadir` is the conf file's
directory, `FEATURE_FOLDER` is ``<datadir>/source/data/<source_dir>/``
(`BaseTrainer.py:22-23`).
"""

from __future__ import annotations

import argparse
import logging
import os


def build_config(conf_file: str, overrides=None):
    from ruart_tpu.core.config import Config

    cfg = Config.from_file(conf_file)
    cfg.opt["confFile"] = conf_file
    cfg.opt["datadir"] = os.path.dirname(conf_file)
    cfg.opt.setdefault(
        "FEATURE_FOLDER",
        os.path.join(
            cfg.opt["datadir"], "./source/data/", str(cfg.opt.get("source_dir", "")), ""
        ),
    )
    for k, v in (overrides or {}).items():
        cfg.opt[k] = v
    return cfg


def setup_logging(log_file: str = ""):
    logging.basicConfig(
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        level=logging.INFO,
        datefmt="%m/%d/%Y %I:%M:%S",
    )
    if log_file:
        os.makedirs("myLog", exist_ok=True)
        handler = logging.FileHandler(os.path.join("myLog", log_file + ".txt"))
        logging.getLogger().addHandler(handler)


def apply_runtime_flags(cfg):
    """Conf-gated runtime switches: persistent compile cache (default on),
    NaN tracing (`debug_nans`, the jax equivalent of the reference's NaN
    asserts, SURVEY §5), and x64 off."""
    import jax

    from ruart_tpu.utils.cache import enable_compilation_cache
    from ruart_tpu.utils.gctune import tune_gc

    tune_gc(cfg.opt)

    # RUART_PLATFORM=cpu forces the backend in-process. The env var exists
    # because JAX_PLATFORMS alone can be overridden by ambient TPU plugins
    # that win platform selection regardless of it; an in-process config
    # update is authoritative. Useful for CPU smoke runs on TPU hosts and
    # for driving the CLIs when the TPU is unavailable.
    platform = os.environ.get("RUART_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if "no_compile_cache" not in cfg.opt:
        enable_compilation_cache()
    if "debug_nans" in cfg.opt:
        jax.config.update("jax_debug_nans", True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="ruart-tpu")
    parser.add_argument("--command", default="train", help="Command: train")
    parser.add_argument("--conf_file", default="conf_stvqa", help="Path to conf file.")
    parser.add_argument("--log_file", default="", help="Path to log file.")
    args = parser.parse_args(argv)

    setup_logging(args.log_file)
    cfg = build_config(args.conf_file)
    apply_runtime_flags(cfg)

    from ruart_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    print("Select command: " + args.command)
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
