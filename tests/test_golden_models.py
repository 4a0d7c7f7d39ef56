"""FULL-NETWORK golden parity vs the reference's own pipeline.

``scripts/gen_golden_models.py`` ran the reference's ``reconstruct()``
(``modelzoo/reconstruct.py:15``) + the PTQ runner's calibration semantics
(``runner/ptq.py:51-68``) on torch networks with deterministic seeded
weights and recorded fp32 + quantized logits. Here the SAME networks are
assembled from this framework's quant modules, calibrated on the SAME
batches through ``mode="calibrate"``, and must reproduce those logits.

This is the composition tier above ``test_golden_layers.py``: BN-fold
chains across residual blocks, observer state across multi-batch
calibration, regex-scoped config resolution, and whole-tower assembly with
fused-in_proj attention are all on the line at once.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from quantize_tpu.models import MODELS
from quantize_tpu.nn.attention import QuantMultiheadAttention
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.layers import QuantConv, QuantDense
from quantize_tpu.nn.norm import FusedLayerNorm
from quantize_tpu.nn.quantizer import reset_observers

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "golden"))
from weightgen import gen_input, gen_param  # noqa: E402

with open(os.path.join(_HERE, "golden", "models.json")) as f:
    _FIXTURE = json.load(f)
_CASES = {c["case"]: c for c in _FIXTURE["cases"]}


def _state_dict(c):
    return {name: gen_param(name, tuple(shape))
            for name, shape in c["param_names"]}


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _calibrate(model, variables, batches, **kw):
    for x in batches:
        _, upd = model.apply(variables, x, mode="calibrate",
                             mutable=["qobs", "qparams"], **kw)
        variables = {**variables, **upd}
    return variables


def _check_logits(ours, c, which, fp_tol=2e-3):
    """fp32 must match tightly. Quantized logits cannot: an f32-reassociation
    difference of ~1e-6 on ONE intermediate activation near a round()
    boundary flips it by a full quant step, and ~20 composed layers
    accumulate many flips — so cross-framework quant logits are compared
    WITHIN the network's own quantization-noise envelope (|quant-fp32| of
    the reference) plus argmax equality. Exact calibration parity is
    asserted separately on every quantizer's scale/zero (`_check_qparams`),
    which the fp32 calibration dataflow makes reassociation-insensitive."""
    ref = np.asarray(c[which], np.float64)
    ours = np.asarray(ours, np.float64).reshape(ref.shape)
    if which == "fp32":
        np.testing.assert_allclose(ours, ref, rtol=fp_tol, atol=fp_tol,
                                   err_msg=f"{c['case']}: fp32 logits")
        return
    qnoise = np.abs(np.asarray(c["quant"], np.float64)
                    - np.asarray(c["fp32"], np.float64))
    diff = np.abs(ours - ref)
    assert diff.max() <= max(5e-3, float(qnoise.max())), (
        f"{c['case']}: quant logit diff {diff.max():.4g} exceeds the "
        f"quantization noise envelope {qnoise.max():.4g}")
    # mean-diff stays within the network's own mean quantization noise;
    # factor 1.0 (not lower): aggressively-clipping estimators (ACIQ) put
    # many activations at clip boundaries where cross-framework f32 noise
    # flips whole quant steps, so the mean diff legitimately approaches
    # the mean noise while scales (checked exactly) still agree
    assert diff.mean() <= max(2e-3, float(qnoise.mean())), (
        f"{c['case']}: mean quant diff {diff.mean():.4g} vs "
        f"mean qnoise {qnoise.mean():.4g}")
    n = len(ref) // c["num_classes"]
    assert np.array_equal(
        np.argmax(ours.reshape(n, -1), -1), np.argmax(ref.reshape(n, -1), -1)
    ), f"{c['case']}: quant argmax disagrees"


def _flat_qparams(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_qparams(v, f"{prefix}/{k}"))
        else:
            out[f"{prefix}/{k}"] = np.asarray(v, np.float64).reshape(-1)
    return out


def _check_qparams(variables, c, path_map):
    """Every reference quantizer's calibrated (scale, zero) must be matched
    by the mapped quantizer here. Calibration sees identical fp32 dataflow
    on both sides, so ranges — single extreme values or deterministic grid
    searches — agree to reassociation noise, not quant-step noise.

    ``c['skip_q']`` names a quantizer suffix whose n_bits>=32 bypass makes
    its reference-side values inert (the reference still calibrates 32-bit
    quantizers, ``quantconv2d.py:141-156``; this framework's bypass never
    creates their qparams). AWQ quantizers additionally compare the
    searched per-group pre-scale when the fixture recorded one."""
    mine = _flat_qparams(variables["qparams"])
    checked = skipped = 0
    skip_suffix = c.get("skip_q")
    for ref_path, rec in c["qparams"].items():
        q = path_map(ref_path)
        # skip on the MAPPED path: MHA activation quantizers are named
        # q/k/v_quantizer reference-side but map to .../a_quantizer here
        if q is None or (skip_suffix and q.endswith(skip_suffix)):
            # mapper explicitly excludes this site (e.g. the reference's
            # inert attnpool quantizers, whose scales sit at their 1.0
            # init because its forward never runs them)
            skipped += 1
            continue
        fields = ("scale", "zero") + (("awq_scale",) if "awq_scale" in rec
                                      else ())
        for field in fields:
            key = f"{q}/{field}"
            assert key in mine, f"{c['case']}: missing qparam {key}"
            ref = np.asarray(rec[field], np.float64)
            ours = mine[key]
            assert ours.shape == ref.shape, (
                f"{c['case']}: {key} shape {ours.shape} vs {ref.shape}")
            atol = 0.05 if field == "zero" else 1e-7
            np.testing.assert_allclose(
                ours, ref, rtol=2e-3, atol=atol,
                err_msg=f"{c['case']}: calibrated {key}")
        checked += 1
    assert checked > 0 and checked + skipped == len(c["qparams"]), (
        f"{c['case']}: {checked} checked + {skipped} skipped != "
        f"{len(c['qparams'])} reference quantizers")


# ---------------------------------------------------------------------------
# ResNet-18: reconstruct -> calibrate -> quantized logits
# ---------------------------------------------------------------------------

def _resnet_qpath(ref_path):
    """'layer1.0.conv1.w_quantizer' -> '/layer1_0/conv1/w_quantizer'."""
    parts = ref_path.split(".")
    out, i = [], 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "downsample" and i + 1 < len(parts) and parts[i + 1] == "0":
            out.append("downsample_conv")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/" + "/".join(out)


_RESNETS = [c["case"] for c in _FIXTURE["cases"] if c["kind"] == "resnet18"]


@pytest.mark.parametrize("case", _RESNETS)
def test_resnet18_pipeline_matches_reference(case):
    from quantize_tpu.models.import_auto import import_torch_checkpoint

    c = _CASES[case]
    cfg = c["quant_cfg"]
    bnf = cfg["default"].get("bn_folding")
    into_scale = bool(bnf.get("into_scale")) if isinstance(bnf, dict) else False

    model = MODELS.build("resnet18", num_classes=c["num_classes"],
                         ctx=QuantCtx(cfg))
    shape = tuple(c["x_shape"])  # (N, 3, H, W) torch order
    batches = [jnp.asarray(_nhwc(gen_input(s, shape, c["in_scale"], c["in_loc"])))
               for s in c["calib_seeds"]]
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], shape,
                                         c["in_scale"], c["in_loc"])))
    v = dict(model.init(jax.random.PRNGKey(0), batches[0][:1], mode="calibrate"))
    v.pop("taps", None)
    v = import_torch_checkpoint("resnet18", _state_dict(c), v,
                                fold_bn=bool(bnf), into_scale=into_scale)
    v = _calibrate(model, reset_observers(v), batches)
    _check_qparams(v, c, _resnet_qpath)
    _check_logits(model.apply(v, x_eval, mode="fp32"), c, "fp32")
    _check_logits(model.apply(v, x_eval, mode="quant"), c, "quant")


# ---------------------------------------------------------------------------
# The reference's OWN CLIP VisionTransformer (modelzoo/clip/model.py:206-240)
# vs this framework's CLIPVisionTransformer mirror
# ---------------------------------------------------------------------------

def _clip_params(c, sd):
    d = c["width"]

    def dense(w, b):
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    p = {
        "conv1": {"kernel": jnp.asarray(
            sd["conv1.weight"].transpose(2, 3, 1, 0))},
        "class_embedding": jnp.asarray(sd["class_embedding"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "ln_pre": ln("ln_pre"), "ln_post": ln("ln_post"),
        "proj": jnp.asarray(sd["proj"]),
        "transformer": {},
    }
    for i in range(c["layers"]):
        pre = f"transformer.resblocks.{i}."
        iw, ib = sd[pre + "attn.in_proj_weight"], sd[pre + "attn.in_proj_bias"]
        p["transformer"][f"resblock_{i}"] = {
            "ln_1": ln(pre + "ln_1"), "ln_2": ln(pre + "ln_2"),
            "attn": {
                "q_proj": dense(iw[:d], ib[:d]),
                "k_proj": dense(iw[d:2 * d], ib[d:2 * d]),
                "v_proj": dense(iw[2 * d:], ib[2 * d:]),
                "out_proj": dense(sd[pre + "attn.out_proj.weight"],
                                  sd[pre + "attn.out_proj.bias"]),
            },
            "c_fc": dense(sd[pre + "mlp.c_fc.weight"],
                          sd[pre + "mlp.c_fc.bias"]),
            "c_proj": dense(sd[pre + "mlp.c_proj.weight"],
                            sd[pre + "mlp.c_proj.bias"]),
        }
    return p


def _clip_qpath(ref_path):
    parts = ref_path.split(".")
    if parts[0] == "conv1":
        return f"/conv1/{parts[-1]}"
    if parts[0] == "transformer":  # transformer.resblocks.N.<rest>
        blk = f"transformer/resblock_{parts[2]}"
        if parts[3] == "attn":
            return f"/{blk}/{_MHA_QMAP[parts[-1]].replace('self_attention', 'attn')}"
        if parts[3] == "mlp":  # mlp.c_fc / mlp.c_proj live flat in the block
            return f"/{blk}/{parts[4]}/{parts[-1]}"
    raise KeyError(ref_path)


_CLIPS = [c["case"] for c in _FIXTURE["cases"] if c["kind"] == "clip_vit"]


@pytest.mark.parametrize("case", _CLIPS)
def test_clip_vision_tower_matches_reference(case):
    from quantize_tpu.models.clip.model import CLIPVisionTransformer

    c = _CASES[case]
    model = CLIPVisionTransformer(
        patch_size=c["patch"], width=c["width"], layers=c["layers"],
        heads=c["heads"], output_dim=c["out_dim"],
        ctx=QuantCtx(c["quant_cfg"]))
    shape = tuple(c["x_shape"])
    batches = [jnp.asarray(_nhwc(gen_input(s, shape, c["in_scale"],
                                           c["in_loc"])))
               for s in c["calib_seeds"]]
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], shape,
                                         c["in_scale"], c["in_loc"])))
    v = dict(model.init(jax.random.PRNGKey(0), batches[0], mode="calibrate"))
    v.pop("taps", None)
    v["params"] = _clip_params(c, _state_dict(c))
    v = _calibrate(model, reset_observers(v), batches)
    _check_qparams(v, c, _clip_qpath)
    _check_logits(model.apply(v, x_eval, mode="fp32"), c, "fp32")
    _check_logits(model.apply(v, x_eval, mode="quant"), c, "quant")


# ---------------------------------------------------------------------------
# The reference's OWN CLIP ModifiedResNet tower (model.py:94-154): 3-conv
# stem, anti-aliased bottlenecks, AttentionPool2d. The reference's attnpool
# reads .weight directly so ITS quantizers are inert — the fixture scopes
# the replay's attnpool to 32-bit (docs/PARITY.md deviation note), which
# also exercises path-regex config scoping through a whole network.
# ---------------------------------------------------------------------------

def _clip_rn_params(c, sd):
    p = {}

    def conv_fold(our, conv_key, bn_key):
        w, b = _fold_bn(sd[f"{conv_key}.weight"],
                        sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"],
                        sd[f"{bn_key}.running_mean"],
                        sd[f"{bn_key}.running_var"])
        node = p
        parts = our.split("/")
        for seg in parts[:-1]:
            node = node.setdefault(seg, {})
        node[parts[-1]] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                           "bias": jnp.asarray(b)}

    for i in (1, 2, 3):
        conv_fold(f"conv{i}", f"conv{i}", f"bn{i}")
    for stage in (1, 2, 3, 4):
        pre = f"layer{stage}.0."
        for i in (1, 2, 3):
            conv_fold(f"layer{stage}_0/conv{i}", pre + f"conv{i}",
                      pre + f"bn{i}")
        if f"{pre}downsample.0.weight" in sd:
            conv_fold(f"layer{stage}_0/downsample_conv",
                      pre + "downsample.0", pre + "downsample.1")
    ap = {"positional_embedding": jnp.asarray(sd["attnpool.positional_embedding"])}
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        ap[proj] = {"kernel": jnp.asarray(sd[f"attnpool.{proj}.weight"].T),
                    "bias": jnp.asarray(sd[f"attnpool.{proj}.bias"])}
    p["attnpool"] = ap
    return p


def _clip_rn_qpath(ref_path):
    parts = ref_path.split(".")
    if parts[0].startswith("layer"):
        blk = f"{parts[0]}_{parts[1]}"
        if parts[2] == "downsample":
            return f"/{blk}/downsample_conv/{parts[-1]}"
        return f"/{blk}/{parts[2]}/{parts[-1]}"
    if parts[0].startswith("conv"):
        return f"/{parts[0]}/{parts[-1]}"
    if parts[0] == "attnpool":
        return None  # inert in the reference (never calibrated) — skipped
    raise KeyError(ref_path)


_CLIP_RNS = [c["case"] for c in _FIXTURE["cases"] if c["kind"] == "clip_rn"]


@pytest.mark.parametrize("case", _CLIP_RNS)
def test_clip_resnet_tower_matches_reference(case):
    from quantize_tpu.models.clip.model import ModifiedResNet

    c = _CASES[case]
    model = ModifiedResNet(layers=tuple(c["layers"]),
                           output_dim=c["out_dim"], heads=c["heads"],
                           width=c["width"], ctx=QuantCtx(c["quant_cfg"]))
    shape = tuple(c["x_shape"])
    batches = [jnp.asarray(_nhwc(gen_input(s, shape, c["in_scale"],
                                           c["in_loc"])))
               for s in c["calib_seeds"]]
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], shape,
                                         c["in_scale"], c["in_loc"])))
    v = dict(model.init(jax.random.PRNGKey(0), batches[0], mode="calibrate"))
    v.pop("taps", None)
    v["params"] = _clip_rn_params(c, _state_dict(c))
    v = _calibrate(model, reset_observers(v), batches)
    _check_qparams(v, c, _clip_rn_qpath)
    _check_logits(model.apply(v, x_eval, mode="fp32"), c, "fp32")
    _check_logits(model.apply(v, x_eval, mode="quant"), c, "quant")


# ---------------------------------------------------------------------------
# MobileNet-style stack: depthwise/grouped conv folding + residual
# ---------------------------------------------------------------------------

_MOBILE_BLOCKS = (("block1", 8, 32, 8, 1), ("block2", 8, 32, 16, 2))


class _MobileStack(nn.Module):
    ctx: QuantCtx
    num_classes: int

    @nn.compact
    def __call__(self, x, mode="fp32"):
        relu6 = lambda v: jnp.clip(v, 0.0, 6.0)

        def conv(name, qpath, feats, k, s, pad, groups=1):
            return QuantConv(
                feats, (k, k), strides=(s, s), padding=pad,
                feature_group_count=groups,
                quant=self.ctx.resolve(qpath, "nn_conv2d"), name=name)

        x = relu6(conv("stem_conv", "/stem_conv", 8, 3, 2,
                       ((1, 1), (1, 1)))(x, mode=mode))
        for bname, cin, cexp, cout, s in _MOBILE_BLOCKS:
            y = relu6(conv(f"{bname}_expand_conv", f"/{bname}/expand_conv",
                           cexp, 1, 1, "VALID")(x, mode=mode))
            y = relu6(conv(f"{bname}_dw_conv", f"/{bname}/dw_conv",
                           cexp, 3, s, ((1, 1), (1, 1)),
                           groups=cexp)(y, mode=mode))
            y = conv(f"{bname}_project_conv", f"/{bname}/project_conv",
                     cout, 1, 1, "VALID")(y, mode=mode)
            x = x + y if (s == 1 and cin == cout) else y
        x = x.mean(axis=(1, 2))
        return QuantDense(self.num_classes, quant=self.ctx.resolve(
            "/fc", "nn_linear"), name="fc")(x, mode=mode)


def _fold_bn(w_oihw, gamma, beta, mean, var, eps=1e-5):
    """Standard BN fold (what the reference's conv2d_bn2d feeds into
    QuantConv2d, quantconv2d.py:115-133)."""
    mult = gamma / np.sqrt(var + eps)
    w = w_oihw * mult.reshape(-1, 1, 1, 1)
    b = beta - mean * mult
    return w, b


def _mobile_params(sd):
    p = {}

    def conv_entry(our, torch_conv, torch_bn):
        w, b = _fold_bn(sd[f"{torch_conv}.weight"],
                        sd[f"{torch_bn}.weight"], sd[f"{torch_bn}.bias"],
                        sd[f"{torch_bn}.running_mean"],
                        sd[f"{torch_bn}.running_var"])
        p[our] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(b)}

    conv_entry("stem_conv", "stem_conv", "stem_bn")
    for bname, *_ in _MOBILE_BLOCKS:
        for part in ("expand", "dw", "project"):
            conv_entry(f"{bname}_{part}_conv", f"{bname}.{part}_conv",
                       f"{bname}.{part}_bn")
    p["fc"] = {"kernel": jnp.asarray(sd["fc.weight"].T),
               "bias": jnp.asarray(sd["fc.bias"])}
    return p


def _mobile_qpath(ref_path):
    parts = ref_path.split(".")
    if parts[0] == "stem_conv" or parts[0] == "fc":
        return "/" + "/".join(parts)
    return f"/{parts[0]}_{parts[1]}/{parts[2]}"


_MOBILES = [c["case"] for c in _FIXTURE["cases"] if c["kind"] == "mobile_stack"]


@pytest.mark.parametrize("case", _MOBILES)
def test_mobile_stack_pipeline_matches_reference(case):
    c = _CASES[case]
    model = _MobileStack(QuantCtx(c["quant_cfg"]), c["num_classes"])
    shape = tuple(c["x_shape"])
    batches = [jnp.asarray(_nhwc(gen_input(s, shape, c["in_scale"],
                                           c["in_loc"])))
               for s in c["calib_seeds"]]
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], shape,
                                         c["in_scale"], c["in_loc"])))
    v = dict(model.init(jax.random.PRNGKey(0), batches[0], mode="calibrate"))
    v.pop("taps", None)
    v["params"] = _mobile_params(_state_dict(c))
    v = _calibrate(model, reset_observers(v), batches)
    _check_qparams(v, c, _mobile_qpath)
    _check_logits(model.apply(v, x_eval, mode="fp32"), c, "fp32")
    _check_logits(model.apply(v, x_eval, mode="quant"), c, "quant")


# ---------------------------------------------------------------------------
# 2-block pre-LN MHA stack (reference torch: seq-first; ours: batch-first)
# ---------------------------------------------------------------------------

class _PreLNBlock(nn.Module):
    ctx: QuantCtx
    qpath: str
    d: int
    h: int
    m: int

    @nn.compact
    def __call__(self, x, mode="fp32"):
        y = FusedLayerNorm(self.d, epsilon=1e-5, name="ln_1")(x, mode)
        x = x + QuantMultiheadAttention(
            self.d, self.h,
            quant=self.ctx.resolve(f"{self.qpath}/self_attention",
                                   "nn_multiheadattention"),
            name="self_attention")(y, mode=mode)
        y = FusedLayerNorm(self.d, epsilon=1e-5, name="ln_2")(x, mode)
        y = QuantDense(self.m, quant=self.ctx.resolve(
            f"{self.qpath}/mlp/0", "nn_linear"), name="linear1")(y, mode=mode)
        y = nn.gelu(y, approximate=False)
        y = QuantDense(self.d, quant=self.ctx.resolve(
            f"{self.qpath}/mlp/2", "nn_linear"), name="linear2")(y, mode=mode)
        return x + y


class _MHAStack(nn.Module):
    ctx: QuantCtx
    d: int
    h: int
    m: int
    depth: int
    num_classes: int

    @nn.compact
    def __call__(self, x, mode="fp32"):  # (B, S, E)
        for i in range(self.depth):
            x = _PreLNBlock(self.ctx, f"/blocks/{i}", self.d, self.h, self.m,
                            name=f"block{i}")(x, mode=mode)
        x = FusedLayerNorm(self.d, epsilon=1e-5, name="ln")(x, mode)
        x = x.mean(axis=1)
        return QuantDense(self.num_classes, quant=self.ctx.resolve(
            "/head", "nn_linear"), name="head")(x, mode=mode)


def _mha_params(c, sd):
    d = c["d"]

    def dense(w, b):
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}

    p = {}
    for i in range(c["depth"]):
        pre = f"blocks.{i}."
        iw, ib = sd[pre + "self_attention.in_proj_weight"], \
            sd[pre + "self_attention.in_proj_bias"]
        p[f"block{i}"] = {
            "ln_1": {"scale": jnp.asarray(sd[pre + "ln_1.weight"]),
                     "bias": jnp.asarray(sd[pre + "ln_1.bias"])},
            "ln_2": {"scale": jnp.asarray(sd[pre + "ln_2.weight"]),
                     "bias": jnp.asarray(sd[pre + "ln_2.bias"])},
            "self_attention": {
                "q_proj": dense(iw[:d], ib[:d]),
                "k_proj": dense(iw[d:2 * d], ib[d:2 * d]),
                "v_proj": dense(iw[2 * d:], ib[2 * d:]),
                "out_proj": dense(sd[pre + "self_attention.out_proj.weight"],
                                  sd[pre + "self_attention.out_proj.bias"]),
            },
            "linear1": dense(sd[pre + "mlp.0.weight"], sd[pre + "mlp.0.bias"]),
            "linear2": dense(sd[pre + "mlp.2.weight"], sd[pre + "mlp.2.bias"]),
        }
    p["ln"] = {"scale": jnp.asarray(sd["ln.weight"]),
               "bias": jnp.asarray(sd["ln.bias"])}
    p["head"] = dense(sd["head.weight"], sd["head.bias"])
    return p


_MHA_QMAP = {
    "q_quantizer": "self_attention/q_proj/a_quantizer",
    "k_quantizer": "self_attention/k_proj/a_quantizer",
    "v_quantizer": "self_attention/v_proj/a_quantizer",
    "q_proj_quantizer": "self_attention/q_proj/w_quantizer",
    "k_proj_quantizer": "self_attention/k_proj/w_quantizer",
    "v_proj_quantizer": "self_attention/v_proj/w_quantizer",
    "out_proj_quantizer": "self_attention/out_proj/w_quantizer",
}


def _mha_qpath(ref_path):
    """'blocks.0.self_attention.q_quantizer' -> the replay module's path."""
    parts = ref_path.split(".")
    if parts[0] == "blocks":
        blk = f"block{parts[1]}"
        if parts[2] == "self_attention":
            return f"/{blk}/{_MHA_QMAP[parts[-1]]}"
        if parts[2] == "mlp":
            lin = {"0": "linear1", "2": "linear2"}[parts[3]]
            return f"/{blk}/{lin}/{parts[-1]}"
        raise KeyError(ref_path)
    if parts[0] == "head":
        return f"/head/{parts[-1]}"
    raise KeyError(ref_path)


_MHAS = [c["case"] for c in _FIXTURE["cases"] if c["kind"] == "mha_stack"]


@pytest.mark.parametrize("case", _MHAS)
def test_mha_stack_pipeline_matches_reference(case):
    c = _CASES[case]
    model = _MHAStack(QuantCtx(c["quant_cfg"]), c["d"], c["h"], c["m"],
                      c["depth"], c["num_classes"])
    shape = tuple(c["x_shape"])  # (S, B, E) torch seq-first
    to_bf = lambda x: jnp.asarray(np.transpose(x, (1, 0, 2)))
    batches = [to_bf(gen_input(s, shape)) for s in c["calib_seeds"]]
    x_eval = to_bf(gen_input(c["eval_seed"], shape))
    v = dict(model.init(jax.random.PRNGKey(0), batches[0], mode="calibrate"))
    v.pop("taps", None)
    v["params"] = _mha_params(c, _state_dict(c))
    v = _calibrate(model, reset_observers(v), batches)
    _check_qparams(v, c, _mha_qpath)
    _check_logits(model.apply(v, x_eval, mode="fp32"), c, "fp32")
    _check_logits(model.apply(v, x_eval, mode="quant"), c, "quant")
