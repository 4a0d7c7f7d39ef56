"""CLI entry point — thin wrapper over :mod:`quantize_tpu.cli`.

Usage (mirrors the reference ``main.py:76-89``):

    python main.py --cfg configs/runners/ptq/minmax/xxx.yaml --opts seed=3 train.max_epoch=2
"""
from quantize_tpu.cli import main, setup_cfg  # noqa: F401  (setup_cfg re-exported for tests)

if __name__ == "__main__":
    main()
