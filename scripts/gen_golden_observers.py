"""Generate golden parity fixtures from the reference range estimators.

Runs the reference's torch observers (loaded straight from
``/root/reference/modelzoo/modules/range`` as an isolated package — the
rest of the reference tree is never imported) on seeded numpy tensors and
records the resulting scale/zero/qmin/qmax (and awq_scale / bias
corrections) into ``tests/golden/observers.json``.

``tests/test_golden_parity.py`` replays the same seeded tensors through this
framework's observers and asserts the outputs agree — the bit-faithful
"reference-convention quantized outputs" tier of the accuracy-parity
harness. Regenerating requires the reference checkout; the committed JSON
does not.

Tensor conventions follow the reference: weights are (C_out, ...), channel
dim 0; activations are (N, C, ...), channel dim 1 (``minmax.py:62-100``).
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import numpy as np
import torch

REF = os.environ.get("QTPU_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "observers.json")


def _load_ref_range():
    pkg = types.ModuleType("refrange")
    pkg.__path__ = [os.path.join(REF, "modelzoo/modules/range")]
    sys.modules["refrange"] = pkg
    mods = {}
    for name in ("minmax", "mse", "cross_entropy", "aciq", "awq", "bias_correct"):
        spec = importlib.util.spec_from_file_location(
            f"refrange.{name}", os.path.join(pkg.__path__[0], f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refrange.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _arr(seed, shape, scale=1.0, loc=0.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale + loc).astype(np.float32)


def _tolist(t):
    return np.asarray(t, np.float32).reshape(-1).tolist()


def main() -> None:
    m = _load_ref_range()
    cases = []

    def record(name, est, flag, batches, extra=None, **call_kw):
        out = None
        for b in batches:
            out = est(flag, torch.from_numpy(b), **call_kw)
        scale, zero, qmin, qmax = out[:4]
        case = {
            "case": name, "flag": flag,
            "scale": _tolist(scale), "zero": _tolist(zero),
            "qmin": int(qmin), "qmax": int(qmax),
        }
        if len(out) > 4:
            case["awq_scale"] = _tolist(out[4])
        if extra:
            case.update(extra)
        cases.append(case)
        print(f"  {name}: scale[0]={case['scale'][0]:.6g} zero[0]={case['zero'][0]:.6g}")

    MinMax, MAMinMax = m["minmax"].MinMax, m["minmax"].MAMinMax
    MSE, CrossEntropy = m["mse"].MSE, m["cross_entropy"].CrossEntropy
    ACIQ, AWQ = m["aciq"].ACIQ, m["awq"].AWQ

    # -- minmax -------------------------------------------------------------
    record("minmax_layer_asym_act_3batch",
           MinMax(8, False, False, "layer"), "activation",
           [_arr(s, (4, 6, 3, 3), 2.0, 0.3) for s in (0, 1, 2)],
           extra={"cfg": {"name": "minmax", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "layer"},
                  "shape": [4, 6, 3, 3], "seeds": [0, 1, 2],
                  "gen": {"scale": 2.0, "loc": 0.3}})
    record("minmax_channel_sym_signed_weight",
           MinMax(8, True, True, "channel"), "weight",
           [_arr(3, (8, 4, 3, 3), 0.5)],
           extra={"cfg": {"name": "minmax", "n_bits": 8, "symmetric": True,
                          "signed": True, "granularity": "channel"},
                  "shape": [8, 4, 3, 3], "seeds": [3], "gen": {"scale": 0.5, "loc": 0.0}})
    record("minmax_layer_asym_percentile",
           MinMax(8, False, False, "layer", percentile=0.01), "weight",
           [_arr(4, (40, 25), 1.0)],
           extra={"cfg": {"name": "minmax", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "layer", "percentile": 0.01},
                  "shape": [40, 25], "seeds": [4], "gen": {"scale": 1.0, "loc": 0.0}})
    record("minmax_channel_sym_percentile",
           MinMax(4, True, True, "channel", percentile=0.05), "weight",
           [_arr(5, (6, 50), 1.0)],
           extra={"cfg": {"name": "minmax", "n_bits": 4, "symmetric": True,
                          "signed": True, "granularity": "channel", "percentile": 0.05},
                  "shape": [6, 50], "seeds": [5], "gen": {"scale": 1.0, "loc": 0.0}})

    # -- maminmax -------------------------------------------------------------
    record("maminmax_layer_asym_act_3batch",
           MAMinMax(momentum=0.1, n_bits=8, symmetric=False, signed=False,
                    granularity="layer"), "activation",
           [_arr(s, (4, 6, 5, 5), 1.5, -0.2) for s in (6, 7, 8)],
           extra={"cfg": {"name": "maminmax", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "layer", "momentum": 0.1},
                  "shape": [4, 6, 5, 5], "seeds": [6, 7, 8],
                  "gen": {"scale": 1.5, "loc": -0.2}})

    # -- mse ------------------------------------------------------------------
    record("mse_channel_sym_signed_w4",
           MSE(n_bits=4, symmetric=True, signed=True, granularity="channel"),
           "weight", [_arr(9, (8, 16), 0.7)],
           extra={"cfg": {"name": "mse", "n_bits": 4, "symmetric": True,
                          "signed": True, "granularity": "channel"},
                  "shape": [8, 16], "seeds": [9], "gen": {"scale": 0.7, "loc": 0.0}})
    record("mse_layer_asym_act8",
           MSE(n_bits=8, symmetric=False, signed=False, granularity="layer"),
           "activation", [_arr(10, (4, 16), 2.0, 0.5)],
           extra={"cfg": {"name": "mse", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "layer"},
                  "shape": [4, 16], "seeds": [10], "gen": {"scale": 2.0, "loc": 0.5}})

    # -- cross_entropy ----------------------------------------------------------
    # NOTE: the reference's CrossEntropy.__call__ passes its args to MSE
    # positionally swapped (cross_entropy.py:68 vs mse.py:131) and crashes on
    # any real use — a latent reference bug. The intended semantics (MSE grid
    # search with the double-softmax CE error) are reached by invoking the
    # MSE machinery directly with the CE measure, which is what this
    # framework implements.
    ce = CrossEntropy(n_bits=8, symmetric=False, signed=False, granularity="layer")
    ce_x = _arr(11, (6, 10), 3.0)
    ce_out = MSE.__call__(ce, "activation", torch.from_numpy(ce_x))
    cases.append({
        "case": "cross_entropy_layer_act8", "flag": "activation",
        "cfg": {"name": "cross_entropy", "n_bits": 8, "symmetric": False,
                "signed": False, "granularity": "layer"},
        "shape": [6, 10], "seeds": [11], "gen": {"scale": 3.0, "loc": 0.0},
        "scale": _tolist(ce_out[0]), "zero": _tolist(ce_out[1]),
        "qmin": int(ce_out[2]), "qmax": int(ce_out[3]),
    })
    print(f"  cross_entropy_layer_act8: scale[0]={_tolist(ce_out[0])[0]:.6g}")

    # -- aciq ---------------------------------------------------------------
    record("aciq_layer_asym_act_3batch",
           ACIQ(n_bits=8, symmetric=False, signed=False, granularity="layer"),
           "activation", [_arr(s, (4, 6, 4, 4), 1.2, 0.1) for s in (12, 13, 14)],
           extra={"cfg": {"name": "aciq", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "layer"},
                  "shape": [4, 6, 4, 4], "seeds": [12, 13, 14],
                  "gen": {"scale": 1.2, "loc": 0.1}})
    record("aciq_channel_fuse_relu",
           ACIQ(n_bits=8, symmetric=False, signed=False, granularity="channel",
                fuse_relu=True), "activation",
           [_arr(15, (4, 6, 4, 4), 1.0, 0.4)],
           extra={"cfg": {"name": "aciq", "n_bits": 8, "symmetric": False,
                          "signed": False, "granularity": "channel",
                          "fuse_relu": True},
                  "shape": [4, 6, 4, 4], "seeds": [15], "gen": {"scale": 1.0, "loc": 0.4}})

    # -- awq (linear layout: ref weight (out,in); ours (in,out)) -------------
    for gname, gsize in (("awq_channel_sym_w4", -1), ("awq_grouped_w4", 8)):
        w = _arr(16, (16, 8), 0.6)         # ref layout (out=16, in=8)
        xs = [_arr(s, (4, 8), 1.0) for s in (17, 18)]
        est = AWQ(n_bits=4, symmetric=True, signed=True, granularity="channel",
                  q_group_size=gsize)
        out = None
        for xb in xs:
            out = est("weight", torch.from_numpy(w), torch.from_numpy(xb),
                      torch.nn.functional.linear)
        scale, zero, qmin, qmax, awq_scale = out
        cases.append({
            "case": gname, "flag": "weight",
            "cfg": {"name": "awq", "n_bits": 4, "symmetric": True,
                    "signed": True, "granularity": "channel",
                    "q_group_size": gsize},
            "w_shape": [16, 8], "w_seed": 16, "w_gen": {"scale": 0.6, "loc": 0.0},
            "act_shape": [4, 8], "act_seeds": [17, 18],
            "scale": _tolist(scale), "zero": _tolist(zero),
            "qmin": int(qmin), "qmax": int(qmax),
            "awq_scale": _tolist(awq_scale),
        })
        print(f"  {gname}: {len(_tolist(scale))} scales")

    # -- bias_correct ---------------------------------------------------------
    BC = m["bias_correct"].BiasCorrect
    bc = BC(momentum=0.1)
    xs = [_arr(s, (4, 8), 1.0, 0.2) for s in (19, 20)]
    for xb in xs:
        bc.calibrate(torch.from_numpy(xb))
    delta_w = _arr(21, (5, 8), 0.05)  # ref layout (out, in)
    bias = bc(None, torch.from_numpy(delta_w),
              lambda x, deltaW, bias: torch.nn.functional.linear(x, deltaW, bias))
    cases.append({
        "case": "bias_correct_linear", "flag": "bias",
        "cfg": {"momentum": 0.1},
        "act_shape": [4, 8], "act_seeds": [19, 20], "act_gen": {"scale": 1.0, "loc": 0.2},
        "dw_shape": [5, 8], "dw_seed": 21, "dw_gen": {"scale": 0.05, "loc": 0.0},
        "bias": _tolist(bias),
    })
    print(f"  bias_correct_linear: bias[0]={_tolist(bias)[0]:.6g}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"generator": "scripts/gen_golden_observers.py",
                   "reference": "JingInAI/Quantize modelzoo/modules/range",
                   "cases": cases}, f, indent=1)
    print(f"wrote {len(cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
