"""Bit-faithful observer parity vs reference-generated golden fixtures.

``tests/golden/observers.json`` holds scale/zero/qmin/qmax (and awq_scale /
bias corrections) computed by running the *reference's* torch range
estimators on seeded tensors (``scripts/gen_golden_observers.py``). These
tests replay the exact same tensors through this framework's observers and
require agreement — the PARITY tier for calibration conventions
(``reference/modelzoo/modules/range/*``).

Tensor layout note: fixtures use the reference layout (weights (C, ...)
channel dim 0, activations (N, C, ...) channel dim 1); our observers take a
``channel_axis``, so the same arrays are fed with axis 0 / 1 respectively —
except AWQ, whose layer layout here is in-channel-penultimate (dense weights
are (in, out)), so the fixture weight is transposed.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.quant.observers import (ACIQ, AWQ, MSE, BiasCorrect,
                                          CrossEntropy, MAMinMax, MinMax)
from quantize_tpu.quant.qspec import QuantSpec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "observers.json")

with open(GOLDEN) as f:
    _FIXTURE = json.load(f)
_CASES = {c["case"]: c for c in _FIXTURE["cases"]}

_CLS = {"minmax": MinMax, "maminmax": MAMinMax, "mse": MSE,
        "cross_entropy": CrossEntropy, "aciq": ACIQ}


def _gen(seed, shape, gen):
    return (np.random.default_rng(seed).normal(size=shape)
            * gen.get("scale", 1.0) + gen.get("loc", 0.0)).astype(np.float32)


def _spec(cfg, flag, channel_axis):
    return QuantSpec.from_config(dict(cfg), flag, channel_axis=channel_axis)


_STANDARD = [c for c in _FIXTURE["cases"]
             if c["cfg"].get("name") in _CLS]


@pytest.mark.parametrize("case", [c["case"] for c in _STANDARD])
def test_observer_matches_reference_golden(case):
    c = _CASES[case]
    cfg = dict(c["cfg"])
    name = cfg.pop("name")
    axis = 0 if c["flag"] == "weight" else 1
    spec = _spec({**cfg, "range": {"name": name}}, c["flag"], channel_axis=axis)
    kwargs = {k: v for k, v in cfg.items()
              if k in ("percentile", "momentum", "fuse_relu", "grid",
                       "maxshrink", "norm")}
    obs = _CLS[name](spec, **kwargs)

    n_ch = c["shape"][axis] if spec.per_channel else 1
    state = obs.init_state(n_ch)
    scale = zero = None
    for seed in c["seeds"]:
        x = jnp.asarray(_gen(seed, tuple(c["shape"]), c["gen"]))
        state, scale, zero = obs(state, x)

    np.testing.assert_allclose(np.asarray(scale).reshape(-1), c["scale"],
                               rtol=1e-4, atol=1e-6, err_msg=f"{case}: scale")
    np.testing.assert_allclose(np.asarray(zero).reshape(-1), c["zero"],
                               rtol=1e-4, atol=1e-4, err_msg=f"{case}: zero")
    assert spec.qmin == c["qmin"] and spec.qmax == c["qmax"]


@pytest.mark.parametrize("case", ["awq_channel_sym_w4", "awq_grouped_w4"])
def test_awq_matches_reference_golden(case):
    c = _CASES[case]
    cfg = dict(c["cfg"])
    gsize = cfg.pop("q_group_size")
    spec = _spec({**{k: v for k, v in cfg.items() if k != "name"},
                  "range": {"name": "awq"}}, "weight", channel_axis=-1)
    obs = AWQ(spec, q_group_size=gsize)

    w_ref = _gen(c["w_seed"], tuple(c["w_shape"]), c["w_gen"])  # (out, in)
    w = jnp.asarray(w_ref.T)  # ours: (in, out)
    state = obs.init_state(w.shape[0])
    apply_fn = lambda wm, x: x @ wm  # noqa: E731
    out = None
    for seed in c["act_seeds"]:
        x = jnp.asarray(_gen(seed, tuple(c["act_shape"]), {"scale": 1.0}))
        out = obs(state, w, pre_act=x, apply_fn=apply_fn)
        state = out[0]
    _, scale, zero, awq_scale = out

    np.testing.assert_allclose(np.asarray(scale).reshape(-1), c["scale"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zero).reshape(-1), c["zero"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(awq_scale).reshape(-1),
                               c["awq_scale"], rtol=1e-4, atol=1e-6)


def test_bias_correct_matches_reference_golden():
    c = _CASES["bias_correct_linear"]
    bc = BiasCorrect(momentum=c["cfg"]["momentum"])
    state = bc.init_state((c["act_shape"][1],))
    for seed in c["act_seeds"]:
        x = jnp.asarray(_gen(seed, tuple(c["act_shape"]), c["act_gen"]))
        state = bc.calibrate(state, x)
    dw_ref = _gen(c["dw_seed"], tuple(c["dw_shape"]), c["dw_gen"])  # (out, in)
    dw = jnp.asarray(dw_ref.T)  # ours: (in, out)
    bias = bc.correction(state, dw, lambda w, ex: ex @ w)
    np.testing.assert_allclose(np.asarray(bias).reshape(-1), c["bias"],
                               rtol=1e-4, atol=1e-6)
