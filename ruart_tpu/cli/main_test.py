"""Test-inference CLI (reference `main_test.py`): loads the checkpoint
named by ``MODEL_PATH`` and writes ``submission.json`` next to it."""

from __future__ import annotations

import argparse

from ruart_tpu.cli.main import apply_runtime_flags, build_config, setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="ruart-tpu inference")
    parser.add_argument("--command", default="predict", help="Command: predict")
    parser.add_argument("--conf_file", default="conf", help="Path to conf file.")
    parser.add_argument("--log_file", default="", help="Path to log file.")
    args = parser.parse_args(argv)

    setup_logging(args.log_file)
    cfg = build_config(args.conf_file)
    apply_runtime_flags(cfg)

    from ruart_tpu.train.trainer import Trainer

    trainer = Trainer(cfg)
    print("Select command: " + args.command)
    trainer.predict_for_test()
    return trainer


if __name__ == "__main__":
    main()
