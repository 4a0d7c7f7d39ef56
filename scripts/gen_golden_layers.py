"""Generate LAYER-level golden parity fixtures from the reference's own
torch quant modules.

Extends the observer tier (``gen_golden_observers.py``) one level up: the
reference's ``Quantizer`` (``modelzoo/modules/quantizer.py:196-246``),
``QuantConv2d`` incl. BN-fold / into_scale / bias-correct
(``quantconv2d.py:115-168``), ``QuantLinear`` (``quantlinear.py:106-121``),
``QuantMultiheadAttention`` with its fused ``in_proj_weight``
(``quantmultiheadattention.py:285-396``), ``QuantReLU`` / ``QuantMaxPool2d``,
and AdaRound's rounding machinery (``range/adaround.py:43-96``) are run
directly on seeded tensors and their outputs recorded into
``tests/golden/layers.json``.

The reference package is loaded in ISOLATION: only ``modelzoo/modules`` (and
``engine/utils`` for the pure-Python tpack) are imported, with stub ``utils``
and ``engine`` modules pre-registered — the rest of the reference tree never
executes. Regenerating requires the reference checkout + torch; the committed
JSON does not.

Tensor conventions in the JSON are the REFERENCE's (NCHW activations, OIHW /
(out,in) weights, seq-first MHA inputs). ``tests/test_golden_layers.py``
transposes to this framework's TPU-native layouts (NHWC / HWIO / (in,out) /
batch-first) when replaying.
"""
from __future__ import annotations

import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np
import torch

REF = os.environ.get("QTPU_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "layers.json")

torch.manual_seed(0)
torch.set_grad_enabled(False)


# ---------------------------------------------------------------------------
# Isolated import of the reference's modelzoo.modules package
# ---------------------------------------------------------------------------

def _load_reference_modules():
    # stub `utils` (range/__init__.py only needs Register ~ a dict)
    utils_stub = types.ModuleType("utils")

    class Register(dict):
        def __init__(self, d=None):
            super().__init__(d or {})

    utils_stub.Register = Register
    sys.modules["utils"] = utils_stub

    # `engine` stub: pure-Python tpack/tunpack/linear from engine/utils;
    # CUDA-only symbols raise if ever called (they aren't on these paths)
    eng_dir = os.path.join(REF, "engine", "utils")
    eng = types.ModuleType("engine")
    for fname in ("tensor_packing", "functions"):
        spec = importlib.util.spec_from_file_location(
            f"refengine_{fname}", os.path.join(eng_dir, f"{fname}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        for k in dir(mod):
            if not k.startswith("_"):
                setattr(eng, k, getattr(mod, k))

    def _missing(name):
        def fn(*a, **k):
            raise NotImplementedError(f"engine.{name} is CUDA-only")
        return fn

    for name in ("conv2d", "quantlinear", "quantconv2d",
                 "quantlinear_float_input", "quantconv2d_float_input"):
        if not hasattr(eng, name):
            setattr(eng, name, _missing(name))
    sys.modules["engine"] = eng

    pkg = types.ModuleType("refmods")
    pkg.__path__ = [os.path.join(REF, "modelzoo", "modules")]
    sys.modules["refmods"] = pkg
    mods = {}
    for name in ("quantizer", "quantconv2d", "quantlinear",
                 "quantmultiheadattention", "quantrelu", "quant_pooling"):
        mods[name] = importlib.import_module(f"refmods.{name}")
    mods["adaround"] = importlib.import_module("refmods.range.adaround")
    return mods


M = _load_reference_modules()
Quantizer = M["quantizer"].Quantizer
QuantConv2d = M["quantconv2d"].QuantConv2d
QuantLinear = M["quantlinear"].QuantLinear
QuantMultiheadAttention = M["quantmultiheadattention"].QuantMultiheadAttention
QuantReLU = M["quantrelu"].QuantReLU
QuantMaxPool2d = M["quant_pooling"].QuantMaxPool2d
AdaRound = M["adaround"].AdaRound

CASES = []


def _arr(seed, shape, scale=1.0, loc=0.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            + loc).astype(np.float32)


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _lst(t):
    return np.asarray(t.detach() if hasattr(t, "detach") else t,
                      np.float32).reshape(-1).tolist()


def add(case):
    CASES.append(case)
    out = case.get("out") or case.get("scale") or case.get("values") or [0]
    print(f"  {case['case']}: out[0]={out[0]:.6g} n={len(out)}")


# ---------------------------------------------------------------------------
# 1. Quantizer.simulate — round/clamp/dequant and pack contracts
#    (reference quantizer.py:196-246)
# ---------------------------------------------------------------------------

def quantizer_case(name, w_setting, flag, shape, seed, gen, n_channels,
                   dim=None, static_scale_seed=None, pack=False,
                   pre_act=None):
    x = _arr(seed, shape, **gen)
    kw = dict(w_setting)
    rng = dict(kw.pop("range", {"name": "minmax"}))
    q = Quantizer(**kw, range=rng, flag=flag, n_channels=n_channels,
                  dim=dim or len(shape))
    ss = None
    if static_scale_seed is not None:
        ss = np.abs(_arr(static_scale_seed, (n_channels,))) + 0.5
        q.set_state({"static_scale": _t(ss)})
    calib_kw = {}
    if rng.get("name") == "awq":
        pa = _arr(pre_act["seed"], pre_act["shape"])
        calib_kw = dict(pre_act=_t(pa), func=torch.nn.functional.linear)
    q.calibrate(_t(x), **calib_kw)
    q.quant(True)
    case = {
        "case": name, "kind": "quantizer_sim", "flag": flag,
        "cfg": dict(w_setting, range=rng), "shape": list(shape),
        "seed": seed, "gen": gen, "n_channels": n_channels,
        "scale": _lst(q.scale), "zero": _lst(q.zero),
        "out": _lst(q(_t(x))),
    }
    if ss is not None:
        case["static_scale_seed"] = static_scale_seed
        case["static_scale"] = _lst(_t(ss))
    if pre_act is not None:
        case["pre_act"] = pre_act
        case["awq_scale"] = _lst(q.awq_scale)
    if pack:
        qi, sc, zo = q.pack(_t(x))
        case["pack_q"] = _lst(qi)
        case["pack_scale"] = _lst(sc)
        case["pack_zero"] = _lst(zo)
    add(case)


MINMAX_W8 = {"n_bits": 8, "symmetric": True, "signed": True,
             "granularity": "channel", "range": {"name": "minmax"}}
MINMAX_W4 = dict(MINMAX_W8, n_bits=4)
MINMAX_A8 = {"n_bits": 8, "symmetric": False, "signed": False,
             "granularity": "layer", "range": {"name": "minmax"}}

quantizer_case("qz_w8_sym_ch", MINMAX_W8, "weight", (12, 8), 100,
               {"scale": 0.5, "loc": 0.0}, 12, pack=True)
quantizer_case("qz_w4_sym_ch", MINMAX_W4, "weight", (12, 8), 101,
               {"scale": 0.7, "loc": 0.1}, 12)
quantizer_case("qz_w8_asym_ch",
               {"n_bits": 8, "symmetric": False, "signed": False,
                "granularity": "channel", "range": {"name": "minmax"}},
               "weight", (10, 6), 102, {"scale": 0.4, "loc": 0.2}, 10,
               pack=True)
quantizer_case("qz_w8_static_scale", MINMAX_W8, "weight", (8, 4, 3, 3), 103,
               {"scale": 0.5, "loc": 0.0}, 8, static_scale_seed=104)
quantizer_case("qz_a8_asym_layer", MINMAX_A8, "activation", (4, 10), 105,
               {"scale": 2.0, "loc": 0.3}, 10)
quantizer_case("qz_a8_maminmax_4d",
               {"n_bits": 8, "symmetric": False, "signed": False,
                "granularity": "layer",
                "range": {"name": "maminmax", "momentum": 0.1}},
               "activation", (2, 6, 5, 5), 106, {"scale": 1.5, "loc": -0.2}, 6)
quantizer_case("qz_awq_w4_ch",
               {"n_bits": 4, "symmetric": True, "signed": True,
                "granularity": "channel",
                "range": {"name": "awq", "grid": 8}},
               "weight", (16, 8), 107, {"scale": 0.6, "loc": 0.0}, 16,
               pre_act={"seed": 108, "shape": [4, 8]})
quantizer_case("qz_awq_w4_grouped",
               {"n_bits": 4, "symmetric": True, "signed": True,
                "granularity": "channel",
                "range": {"name": "awq", "grid": 8, "q_group_size": 4}},
               "weight", (16, 8), 109, {"scale": 0.6, "loc": 0.0}, 32,
               pre_act={"seed": 110, "shape": [4, 8]})


# ---------------------------------------------------------------------------
# 2. QuantConv2d forward — BN folding, into_scale, bias correction
#    (reference quantconv2d.py:115-168)
# ---------------------------------------------------------------------------

def conv_case(name, w_setting, a_setting, in_ch, out_ch, k, seed0,
              groups=1, stride=1, padding=1, bn_folding=None,
              bias_correct=None, n_calib=2, packed=False):
    wshape = (out_ch, in_ch // groups, k, k)
    w = _arr(seed0, wshape, 0.5)
    b = _arr(seed0 + 1, (out_ch,), 0.1)
    params = {"_parameters": {"weight": _t(w), "bias": _t(b)}}
    bf = {}
    if bn_folding is not None:
        bf = {
            "weight": _t(np.abs(_arr(seed0 + 2, (out_ch,))) + 0.5),
            "bias": _t(_arr(seed0 + 3, (out_ch,), 0.2)),
            "running_mean": _t(_arr(seed0 + 4, (out_ch,), 0.3)),
            "running_var": _t(np.abs(_arr(seed0 + 5, (out_ch,))) + 0.8),
            "eps": 1e-5,
        }
        if bn_folding == "into_scale":
            bf["into_scale"] = True
    layer = QuantConv2d(
        in_ch, out_ch, k, stride=stride, padding=padding, groups=groups,
        w_setting=dict(w_setting), a_setting=dict(a_setting),
        bn_folding=bf, bias_correct=dict(bias_correct or {}) if bias_correct else {},
        **params)
    xshape = (2, in_ch, 8, 8)
    calib_seeds = [seed0 + 10 + i for i in range(n_calib)]
    for s in calib_seeds:
        layer.calibrate(_t(_arr(s, xshape, 1.0, 0.1)))
    for m in layer.modules():
        if isinstance(m, Quantizer):
            m.quant(True)
    x_eval = _arr(seed0 + 30, xshape, 1.0, 0.1)
    out = layer(_t(x_eval))
    case = {
        "case": name, "kind": "conv_forward",
        "w_setting": w_setting, "a_setting": a_setting,
        "in_ch": in_ch, "out_ch": out_ch, "k": k, "groups": groups,
        "stride": stride, "padding": padding,
        "w_seed": seed0, "b_seed": seed0 + 1,
        "bn_folding": bool(bn_folding),
        "into_scale": bn_folding == "into_scale",
        "bn_seeds": [seed0 + 2, seed0 + 3, seed0 + 4, seed0 + 5]
        if bn_folding else None,
        "bias_correct": dict(bias_correct) if bias_correct else None,
        "x_shape": list(xshape), "calib_seeds": calib_seeds,
        "eval_seed": seed0 + 30,
        "out_shape": list(out.shape), "out": _lst(out),
    }
    if packed:
        layer.pack()
        # the reference's post-pack forward is only reachable through its
        # load_state_dict path, which tunpacks the weight back to ints
        # (quantconv2d.py:218-235) — replay that here
        layer.weight.data = sys.modules["engine"].tunpack(
            layer.weight, layer.w_des)
        out_p = layer(_t(x_eval))
        case["packed_out"] = _lst(out_p)
    add(case)


MSE_W4 = {"n_bits": 4, "symmetric": True, "signed": True,
          "granularity": "channel", "range": {"name": "mse", "grid": 40}}

conv_case("conv_w8a8_plain", MINMAX_W8, MINMAX_A8, 6, 12, 3, 200,
          packed=True)
conv_case("conv_w8a8_bnfold", MINMAX_W8, MINMAX_A8, 6, 12, 3, 210,
          bn_folding=True)
conv_case("conv_w8a8_into_scale", MINMAX_W8, MINMAX_A8, 6, 12, 3, 220,
          bn_folding="into_scale")
conv_case("conv_w8a8_biascorrect", MINMAX_W8, MINMAX_A8, 6, 12, 3, 230,
          bias_correct={"momentum": 0.1})
conv_case("conv_w4a8_mse", MSE_W4, MINMAX_A8, 6, 12, 3, 240)
conv_case("conv_w8a8_grouped", MINMAX_W8, MINMAX_A8, 8, 12, 3, 250, groups=2)
conv_case("conv_w8a8_stride2", MINMAX_W8, MINMAX_A8, 6, 12, 3, 260, stride=2)
conv_case("conv_w4_only", MINMAX_W4,
          {"n_bits": 32, "range": {"name": "minmax"}}, 6, 12, 3, 270)
conv_case("conv_w8a8_asym_w",
          {"n_bits": 8, "symmetric": False, "signed": False,
           "granularity": "channel", "range": {"name": "minmax"}},
          MINMAX_A8, 6, 12, 3, 280)


# ---------------------------------------------------------------------------
# 3. QuantLinear forward (reference quantlinear.py:106-121)
# ---------------------------------------------------------------------------

def linear_case(name, w_setting, a_setting, in_f, out_f, seed0,
                bias_correct=None, packed=False):
    w = _arr(seed0, (out_f, in_f), 0.5)
    b = _arr(seed0 + 1, (out_f,), 0.1)
    layer = QuantLinear(
        in_f, out_f, w_setting=dict(w_setting), a_setting=dict(a_setting),
        bias_correct=dict(bias_correct or {}) if bias_correct else {},
        **{"_parameters": {"weight": _t(w), "bias": _t(b)}})
    xshape = (4, in_f)
    calib_seeds = [seed0 + 10, seed0 + 11]
    for s in calib_seeds:
        layer.calibrate(_t(_arr(s, xshape, 1.0, 0.1)))
    for m in layer.modules():
        if isinstance(m, Quantizer):
            m.quant(True)
    x_eval = _arr(seed0 + 30, xshape, 1.0, 0.1)
    out = layer(_t(x_eval))
    case = {
        "case": name, "kind": "linear_forward",
        "w_setting": w_setting, "a_setting": a_setting,
        "in_f": in_f, "out_f": out_f,
        "w_seed": seed0, "b_seed": seed0 + 1,
        "bias_correct": dict(bias_correct) if bias_correct else None,
        "x_shape": list(xshape), "calib_seeds": calib_seeds,
        "eval_seed": seed0 + 30, "out": _lst(out),
    }
    if packed:
        layer.pack()
        layer.weight.data = sys.modules["engine"].tunpack(
            layer.weight, layer.w_des)  # reference load-path unpack
        case["packed_out"] = _lst(layer(_t(x_eval)))
    add(case)


linear_case("linear_w8a8", MINMAX_W8, MINMAX_A8, 16, 8, 300, packed=True)
linear_case("linear_w4a8_mse", MSE_W4, MINMAX_A8, 16, 8, 310)
linear_case("linear_w8a8_biascorrect", MINMAX_W8, MINMAX_A8, 16, 8, 320,
            bias_correct={"momentum": 0.1})
linear_case("linear_w4_only", MINMAX_W4,
            {"n_bits": 32, "range": {"name": "minmax"}}, 16, 8, 330)


# ---------------------------------------------------------------------------
# 4. QuantMultiheadAttention forward — fused in_proj, 7-quantizer layout
#    (reference quantmultiheadattention.py:285-396)
# ---------------------------------------------------------------------------

def mha_case(name, w_setting, a_setting, embed, heads, s, b, seed0,
             bias_correct=None):
    in_w = _arr(seed0, (3 * embed, embed), 0.3)
    in_b = _arr(seed0 + 1, (3 * embed,), 0.05)
    out_w = _arr(seed0 + 2, (embed, embed), 0.3)
    out_b = _arr(seed0 + 3, (embed,), 0.05)
    out_proj = torch.nn.Linear(embed, embed)
    out_proj.weight.data = _t(out_w)
    out_proj.bias.data = _t(out_b)
    layer = QuantMultiheadAttention(
        embed, heads, w_setting=dict(w_setting), a_setting=dict(a_setting),
        bias_correct=dict(bias_correct or {}) if bias_correct else {},
        **{"_parameters": {"in_proj_weight": _t(in_w),
                           "in_proj_bias": _t(in_b)},
           "_modules": {"out_proj": out_proj}})
    xshape = (s, b, embed)  # seq-first (reference torch default)
    calib_seeds = [seed0 + 10, seed0 + 11]
    for sd in calib_seeds:
        xb = _t(_arr(sd, xshape, 1.0, 0.0))
        layer.calibrate(xb, xb, xb)
    for m in layer.modules():
        if isinstance(m, Quantizer):
            m.quant(True)
    x_eval = _arr(seed0 + 30, xshape, 1.0, 0.0)
    xt = _t(x_eval)
    out, _ = layer(xt, xt, xt, need_weights=False)
    add({
        "case": name, "kind": "mha_forward",
        "w_setting": w_setting, "a_setting": a_setting,
        "embed": embed, "heads": heads, "s": s, "b": b,
        "w_seeds": [seed0, seed0 + 1, seed0 + 2, seed0 + 3],
        "bias_correct": dict(bias_correct) if bias_correct else None,
        "x_shape": list(xshape), "calib_seeds": calib_seeds,
        "eval_seed": seed0 + 30, "out": _lst(out),
    })


mha_case("mha_w8a8", MINMAX_W8, MINMAX_A8, 16, 4, 5, 2, 400)
mha_case("mha_w4a8", MINMAX_W4, MINMAX_A8, 16, 4, 5, 2, 410)
mha_case("mha_w8a8_biascorrect", MINMAX_W8, MINMAX_A8, 16, 4, 5, 2, 420,
         bias_correct={"momentum": 0.1})


# ---------------------------------------------------------------------------
# 5. QuantReLU / QuantMaxPool2d (reference quantrelu.py / quant_pooling.py)
# ---------------------------------------------------------------------------

for name, build, xshape, seed in (
    ("quantrelu_a8", lambda: QuantReLU(a_setting=dict(MINMAX_A8)),
     (2, 6, 5, 5), 500),
    ("quantmaxpool_a8",
     lambda: QuantMaxPool2d(2, stride=2, a_setting=dict(MINMAX_A8)),
     (2, 6, 8, 8), 510),
):
    layer = build()
    calib_seeds = [seed + 1, seed + 2]
    for sd in calib_seeds:
        layer.calibrate(_t(_arr(sd, xshape, 1.5, 0.1)))
    layer.a_quantizer.quant(True)
    x_eval = _arr(seed + 5, xshape, 1.5, 0.1)
    out = layer._forward(_t(x_eval))
    add({
        "case": name, "kind": name.split("_")[0],
        "a_setting": MINMAX_A8, "x_shape": list(xshape),
        "calib_seeds": calib_seeds, "eval_seed": seed + 5,
        "out": _lst(out),
    })


# ---------------------------------------------------------------------------
# 6. AdaRound machinery (reference range/adaround.py:43-96)
# ---------------------------------------------------------------------------

ar = AdaRound()
v = _arr(600, (6, 4), 2.0)
ar.V.data = _t(v)
ar.ada_init = True
add({"case": "adaround_recv", "kind": "adaround", "what": "recV",
     "v_seed": 600, "v_shape": [6, 4], "v_gen": {"scale": 2.0},
     "out": _lst(ar.recV)})
add({"case": "adaround_reg_b20", "kind": "adaround", "what": "regularization",
     "v_seed": 600, "v_shape": [6, 4], "beta": 20.0,
     "out": [float(ar.regularization(20.0))]})
add({"case": "adaround_reg_b2", "kind": "adaround", "what": "regularization",
     "v_seed": 600, "v_shape": [6, 4], "beta": 2.0,
     "out": [float(ar.regularization(2.0))]})

ar2 = AdaRound()
x = _arr(601, (6, 4), 3.0)
out = ar2(_t(x))  # inits V from frac(x), then STE forward
add({"case": "adaround_init_forward", "kind": "adaround", "what": "forward",
     "x_seed": 601, "x_shape": [6, 4], "x_gen": {"scale": 3.0},
     "v_init": _lst(ar2.V), "out": _lst(out)})


os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump({"generator": "scripts/gen_golden_layers.py",
               "reference": "JingInAI/Quantize modelzoo/modules",
               "cases": CASES}, f)
print(f"wrote {len(CASES)} cases to {OUT}")
