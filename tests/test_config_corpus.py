"""Every YAML in configs/ must parse through the config system (validating
the ``_base_`` chains) and name only registered components."""
import glob
import os

import pytest

from quantize_tpu.utils import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                               recursive=True))
# base/partial fragments are merged into others, not run standalone
RUNNABLE = [p for p in ALL_CONFIGS
            if "/datasets/" not in p and not p.endswith("base.yaml")
            and "/sweeps/" not in p]


def _load(path):
    cwd = os.getcwd()
    os.chdir(REPO)  # _base_ paths are repo-relative
    try:
        cfg = Config()
        cfg.merge_from_yaml(path)
        return cfg
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_parses(path):
    _load(path)


@pytest.mark.parametrize("path", RUNNABLE, ids=lambda p: os.path.relpath(p, REPO))
def test_runnable_config_names_resolve(path):
    cfg = _load(path)
    from quantize_tpu.models import MODELS
    from quantize_tpu.quant.observers import RANGES
    from quantize_tpu.runners import RUNNERS

    if cfg.runner and cfg.runner.name:
        RUNNERS.lookup(cfg.runner.name)
    if cfg.model and cfg.model.name:
        assert cfg.model.name in MODELS, cfg.model.name
    quant = cfg.quant.to_dict() if cfg.quant else {}

    def check_ranges(node):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k == "range" and isinstance(v, dict) and v.get("name"):
                RANGES.lookup(v["name"])
            elif isinstance(v, dict):
                check_ranges(v)

    check_ranges(quant)


def test_corpus_size_matches_reference_scale():
    # reference ships 57 configs; ours must cover at least that families
    assert len(ALL_CONFIGS) >= 57
