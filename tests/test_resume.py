"""Checkpoint/resume loop: interrupted run continues where it left off."""
import numpy as np

from quantize_tpu.runners import build_runner
from quantize_tpu.runners.resume import ResumableRun
from quantize_tpu.utils import Config, Logger


def make_cfg(tmp_path, max_epoch=4):
    return Config({
        "seed": 0,
        "output_dir": str(tmp_path),
        "model": {"name": "testcnn", "num_classes": 4},
        "runner": {"name": "ptq"},
        "quant": {"default": {
            "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                       "range": {"name": "minmax"}},
            "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True}},
        "train": {"max_epoch": max_epoch, "print_freq": 100},
    })


def make_loader():
    from quantize_tpu.data import DataLoader, make_synthetic

    return DataLoader(make_synthetic(n=64, image_size=8, num_classes=4), batch_size=32)


def test_resume_after_interrupt(tmp_path):
    Logger(None)
    cfg = make_cfg(tmp_path)
    runner = build_runner(cfg, make_loader(), None, None)

    # simulate an interruption after 2 epochs
    class Boom(Exception):
        pass

    orig_update = runner.update
    calls = {"n": 0}

    def crashing_update(epoch):
        orig_update(epoch)
        calls["n"] += 1
        if epoch == 1:
            raise Boom

    runner.update = crashing_update
    rr = ResumableRun(runner, ckpt_every_epochs=1)
    try:
        rr.run()
    except Boom:
        pass
    assert not rr.finished

    # fresh runner resumes at epoch 1 (the epoch whose checkpoint was never
    # written because the crash hit during its update)
    runner2 = build_runner(cfg, make_loader(), None, None)
    seen = []
    orig2 = runner2.update
    runner2.update = lambda e: (seen.append(e), orig2(e))
    rr2 = ResumableRun(runner2, ckpt_every_epochs=1)
    rr2.run()
    assert seen == [1, 2, 3]
    assert rr2.finished

    # third invocation is a no-op
    runner3 = build_runner(cfg, make_loader(), None, None)
    rr3 = ResumableRun(runner3)
    rr3.run()  # skips
