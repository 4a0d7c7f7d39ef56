"""CLI entry point (installable as ``quantize-tpu``).

Usage (mirrors the reference ``main.py:76-89``):

    quantize-tpu --cfg configs/runners/ptq/minmax/xxx.yaml --opts seed=3 train.max_epoch=2

Builds the config (defaults -> YAML chain -> CLI --opts), sets up logging and
seeding, and executes the configured runner.
"""
from __future__ import annotations

import argparse
import os


def _honor_jax_platforms() -> None:
    # Honor JAX_PLATFORMS even when a preloaded device plugin would otherwise
    # take priority (e.g. JAX_PLATFORMS=cpu for device-free runs). Must run
    # before the first backend use.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def setup_cfg(args: argparse.Namespace):
    from quantize_tpu.utils import Config

    cfg = Config({
        "seed": -1,
        "output_dir": "results/default",
        "train": {"max_epoch": 1, "print_freq": 10},
    })
    for cfg_file in args.cfg or []:
        cfg.merge_from_yaml(cfg_file)
    if args.output_dir:
        cfg.merge_from_dict({"output_dir": args.output_dir})
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main() -> None:
    _honor_jax_platforms()
    from quantize_tpu.runners import execute_runner
    from quantize_tpu.utils import Logger, set_random_seed

    parser = argparse.ArgumentParser(description="quantize_tpu")
    parser.add_argument("--cfg", nargs="+", help="config yaml file(s)")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--opts", nargs="*", default=None, help="k.x=v overrides")
    args = parser.parse_args()

    cfg = setup_cfg(args)
    logger = Logger(cfg.output_dir)
    logger.dump_config(cfg)
    logger.info("config:\n" + str(cfg))

    if cfg.seed is not None and cfg.seed >= 0:
        set_random_seed(cfg.seed)

    execute_runner(cfg)


if __name__ == "__main__":
    main()
