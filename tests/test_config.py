import os

import pytest

from quantize_tpu.utils import Config, dict_merge, parse_value


def test_parse_value():
    assert parse_value("1") == 1
    assert parse_value("1.5") == 1.5
    assert parse_value("True") is True
    assert parse_value("false") is False
    assert parse_value("None") is None
    assert parse_value("abc.def") == "abc.def"
    assert parse_value(["1", "2"]) == [1, 2]
    assert parse_value({"a": "1", "b": {"c": "2"}}) == {"a": 1, "b": {"c": 2}}


def test_attribute_and_item_access():
    cfg = Config({"a": 1, "b": {"c": 2}})
    assert cfg.a == 1
    assert cfg.b.c == 2
    assert cfg["b.c"] == 2
    assert cfg.missing is None
    assert cfg.b.missing is None
    with pytest.raises(KeyError):
        cfg["b.zzz"]


def test_merge_from_dict_deep():
    cfg = Config({"quant": {"default": {"weight": {"n_bits": 8, "symmetric": True}}}})
    cfg.merge_from_dict({"quant": {"default": {"weight": {"n_bits": 4}}}})
    assert cfg.quant.default.weight.n_bits == 4
    assert cfg.quant.default.weight.symmetric is True


def test_delete_and_replace_markers():
    cfg = Config({"a": {"x": 1, "y": 2}, "b": {"x": 1}})
    cfg.merge_from_dict({"a": {"_replace_": True, "z": 3}})
    assert cfg.to_dict()["a"] == {"z": 3}
    cfg.merge_from_dict({"b": {"_delete_": True}})
    assert "b" not in cfg.to_dict()


def test_merge_from_list():
    cfg = Config({"model": {"name": "resnet18"}})
    cfg.merge_from_list(["model.name=resnet50", "seed=3", "train.lr=0.1"])
    assert cfg.model.name == "resnet50"
    assert cfg.seed == 3
    assert cfg.train.lr == 0.1


def test_yaml_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nb:\n  c: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_base_: {base}\nb:\n  d: 3\n")
    cfg = Config().merge_from_yaml(str(child))
    assert cfg.a == 1 and cfg.b.c == 2 and cfg.b.d == 3


def test_yaml_base_relative_to_file(tmp_path):
    sub = tmp_path / "sub"
    os.makedirs(sub)
    (sub / "base.yaml").write_text("x: 9\n")
    (sub / "child.yaml").write_text("_base_: base.yaml\ny: 2\n")
    cfg = Config().merge_from_yaml(str(sub / "child.yaml"))
    assert cfg.x == 9 and cfg.y == 2


def test_dict_merge():
    assert dict_merge({"a": {"b": 1}}, {"a": {"c": 2}}) == {"a": {"b": 1, "c": 2}}
    assert dict_merge(None, {"a": 1}) == {"a": 1}


def test_freeze_singleton():
    from quantize_tpu.utils import get_cfg

    cfg = Config({"k": 1})
    cfg.freeze()
    assert get_cfg() is cfg


def test_merge_never_aliases_or_mutates_src():
    """deep_merge/dict_merge output must not alias source subtrees: with
    aliasing, a later merge into the result recurses into — and mutates —
    the SOURCE config. This exact bug let a '/conv1'-scoped override leak
    into the shared quant default for every layer resolved after the stem
    (caught by the resnet18_aciq_act8 network golden case)."""
    from quantize_tpu.utils import dict_merge

    default = {"activation": {"range": {"name": "aciq"}, "n_bits": 8}}
    override = {"activation": {"range": {"name": "minmax"}}}

    merged = dict_merge({}, default)
    dict_merge(merged, override)      # merge an override ON TOP of a result
    assert default["activation"]["range"]["name"] == "aciq", (
        "merging into a dict_merge result mutated the original source")

    # and repeated scoped resolution must be order-independent
    from quantize_tpu.nn.intercept import QuantCtx

    ctx = QuantCtx({"default": dict(default),
                    "/conv1": {"activation": {"range": {"name": "minmax"}}}})
    ctx.resolve("/conv1", "nn_conv2d")            # stem resolved first ...
    late = ctx.resolve("/layer1/0/conv1", "nn_conv2d")
    assert dict(dict(late.activation)["range"])["name"] == "aciq"
