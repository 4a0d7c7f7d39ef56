"""Generate golden TRAJECTORY fixtures from the reference's own optimization
loops — the composition the PTQ golden tier (``gen_golden_models.py``) stops
short of:

* AdaRound: the reference runner's literal per-step scheme
  (``/root/reference/runner/adaround.py:121-166``) — lazy init via one
  calibrating+quantized forward (``:125-129``), per step an FP32 hook-capture
  pass (``:131-136``) + a quantized hook-capture pass (``:138-143``), loss =
  sum of per-module output MSEs (``:145-148``) + beta-scheduled rounding
  regularization with beta linearly annealed 20->2 after 20% warmup
  (``:103-119, 150-158``), optimizer step over ONLY the AdaRound V offsets
  (``:44-72``). Plain SGD (torch.optim.SGD, no momentum) so the trajectory
  has no optimizer-epsilon divergence across frameworks.
* QAT: the reference runner's calibrate-then-train scheme
  (``/root/reference/runner/qat.py:34-76``) — one PTQ calibration epoch
  (``runner/ptq.py:71-78`` semantics), then SGD over ALL parameters
  (weights + quantizer scale/zero, which are nn.Parameters,
  ``modelzoo/modules/quantizer.py:120-121``) with cross-entropy through the
  fake-quant STE graph (``Round.backward``, ``quantizer.py:15-40``).

Recorded per case: per-step losses, the final rounding artifacts (AdaRound:
every V tensor + its >=0.5 rounding decisions; QAT: the full final
state_dict), calibrated scales/zeros, and fp32/quant logits on a held-out
batch. Weights regenerate from ``tests/golden/weightgen.py`` — the fixture
stores no initial-weight blobs.

The replay (``tests/test_golden_traj.py``) drives THIS FRAMEWORK'S actual
AdaRound (joint mode) and QAT runners over the same data and asserts the
trajectories land in the same place.
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
import torch.nn as nn
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("QTPU_REFERENCE", "/root/reference")
OUT = os.path.join(REPO, "tests", "golden", "traj.json")

sys.path.insert(0, os.path.join(REPO, "tests", "golden"))
from weightgen import gen_input, gen_param  # noqa: E402

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# Isolated reference import (same recipe as gen_golden_models.py)
# ---------------------------------------------------------------------------

def _import_pkg(name: str, path: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(path, "__init__.py"),
        submodule_search_locations=[path])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_reference():
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

    for fname in ("conv2d", "quantlinear", "quantconv2d",
                  "quantlinear_float_input", "quantconv2d_float_input"):
        if not hasattr(eng, fname):
            setattr(eng, fname, _missing(fname))
    sys.modules["engine"] = eng

    _import_pkg("utils", os.path.join(REF, "utils"))

    mz = types.ModuleType("refmz")
    mz.__path__ = [os.path.join(REF, "modelzoo")]
    sys.modules["refmz"] = mz
    importlib.import_module("refmz.modules")
    rec = importlib.import_module("refmz.reconstruct")
    quantizer = importlib.import_module("refmz.modules.quantizer")
    rng_pkg = importlib.import_module("refmz.modules.range")
    return rec.reconstruct, quantizer.Quantizer, rng_pkg.RANGES["adaround"]


reconstruct, Quantizer, RefAdaRound = _load_reference()
from utils import Configs  # noqa: E402


# ---------------------------------------------------------------------------
# Tiny trajectory net (mirrored by quantize_tpu.models.testnet.TrajNet)
# ---------------------------------------------------------------------------

class TrajNet(nn.Module):
    """conv(3->8,s2) -> relu -> conv(8->16,s2) -> relu -> GAP -> fc. Plain
    biased convs, no BN: reconstruct maps them via its lone-conv branch
    (``modelzoo/reconstruct.py:106-113``), and functional relu keeps the
    module list to exactly the three reconstructed quant modules."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, 2, 1)
        self.conv2 = nn.Conv2d(8, 16, 3, 2, 1)
        self.fc = nn.Linear(16, num_classes)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        return self.fc(x.mean(dim=(2, 3)))


def fill_weights(model: nn.Module):
    names = []
    with torch.no_grad():
        for name, t in model.state_dict().items():
            if torch.is_floating_point(t):
                t.copy_(torch.from_numpy(gen_param(name, tuple(t.shape))))
                names.append([name, list(t.shape)])
    return names


def set_mode(model, calibrating: bool, quantized: bool):
    """runner/ptq.py:51-68 semantics."""
    for m in model.modules():
        if hasattr(m, "calibrating"):
            m.calibrating = calibrating
        if isinstance(m, Quantizer):
            m.quant(quantized)


def hooked_forward(model, x, detach: bool):
    """Forward collecting every Quant* module's output in execution order —
    the reference's hook scheme (runner/adaround.py:74-94)."""
    outs, handles = [], []

    def hook(module, _, output):
        name = module.__class__.__name__
        if not name.startswith("Quant") or name == "Quantizer":
            return
        if isinstance(output, (tuple, list)):
            output = output[0]
        outs.append(output.detach().clone() if detach else output)

    for m in model.modules():
        handles.append(m.register_forward_hook(hook))
    logits = model(x)
    for h in handles:
        h.remove()
    return outs, logits


def get_beta(current, total, start=20, end=2, warmup=0.2):
    """runner/adaround.py:103-119, verbatim formula."""
    if current / total < warmup:
        return start
    return start + (end - start) * (current / total - warmup) / (1 - warmup)


def dump_qparams(model):
    out = {}
    for path, m in model.named_modules():
        if isinstance(m, Quantizer) and getattr(m, "scale", None) is not None:
            out[path] = {
                "scale": np.asarray(m.scale.detach(), np.float32).reshape(-1).tolist(),
                "zero": np.asarray(m.zero.detach(), np.float32).reshape(-1).tolist(),
            }
    return out


CASES = []


# ---------------------------------------------------------------------------
# AdaRound trajectory (runner/adaround.py:121-166)
# ---------------------------------------------------------------------------

def adaround_traj_case(name, w_bits=4, lr=24.0, steps=24, num_classes=10):
    cfg = {"default": {
        "weight": {"n_bits": w_bits, "symmetric": True, "signed": True,
                   "granularity": "channel",
                   "range": {"name": "minmax"},
                   "adaround": {"apply": True}},
        "activation": {"n_bits": 32, "range": {"name": "minmax"}},
        "bn_folding": False,
    }}
    x_shape = (8, 3, 16, 16)
    in_scale, in_loc = 0.6, 0.1
    traj_seeds = [7501 + i for i in range(steps)]
    eval_seed = 7520

    model = TrajNet(num_classes)
    names = fill_weights(model)
    model.eval()
    model = reconstruct(model, Configs(cfg))

    batches = [torch.from_numpy(gen_input(s, x_shape, in_scale, in_loc))
               for s in traj_seeds]

    # lazy init: ONE calibrating+quantized forward (adaround.py:125-129)
    set_mode(model, calibrating=True, quantized=True)
    with torch.no_grad():
        model(batches[0])

    # nearest-rounding decisions at init, to prove the trajectory moved
    init_masks = {}
    for path, m in model.named_modules():
        if isinstance(m, Quantizer) and isinstance(m.adaround, RefAdaRound):
            init_masks[path] = (m.adaround.recV.detach() >= 0.5).numpy()

    ada_modules = [m for m in model.modules() if isinstance(m, RefAdaRound)]
    params = [p for m in ada_modules for p in m.parameters()]
    v_init = [p.detach().clone() for p in params]
    opt = torch.optim.SGD(params, lr=lr)

    losses = []
    total = len(batches)
    for it, img in enumerate(batches):
        set_mode(model, calibrating=True, quantized=False)   # :131-136
        with torch.no_grad():
            orig, _ = hooked_forward(model, img, detach=True)
        set_mode(model, calibrating=False, quantized=True)   # :138-143
        quant, _ = hooked_forward(model, img, detach=False)
        recon = sum(F.mse_loss(q, o) for q, o in zip(quant, orig))  # :145-148
        beta = get_beta(it, total)                           # :150-153
        reg = sum(m.regularization(beta) for m in ada_modules)  # :155-157
        loss = recon + reg
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))

    v_final, masks, flips = {}, {}, 0
    for path, m in model.named_modules():
        if isinstance(m, Quantizer) and isinstance(m.adaround, RefAdaRound):
            v = m.adaround.V.detach().numpy()
            mask = (m.adaround.recV.detach() >= 0.5).numpy()
            v_final[path] = v.reshape(-1).astype(np.float32).tolist()
            masks[path] = mask.reshape(-1).astype(np.int8).tolist()
            flips += int((mask != init_masks[path]).sum())

    dv = max(float((p.detach()-v0).abs().max()) for p, v0 in zip(params, v_init))
    near = min(float(p.detach().abs().min()) for p in params)
    print(f"    max|dV|={dv:.4g}  min|V_final|={near:.4g}")
    x_eval = torch.from_numpy(gen_input(eval_seed, x_shape, in_scale, in_loc))
    with torch.no_grad():
        set_mode(model, calibrating=False, quantized=False)
        fp32 = model(x_eval).numpy().reshape(-1)
        set_mode(model, calibrating=False, quantized=True)
        quant_logits = model(x_eval).numpy().reshape(-1)

    CASES.append({
        "case": name, "kind": "adaround_traj", "quant_cfg": cfg,
        "num_classes": num_classes, "x_shape": list(x_shape),
        "in_scale": in_scale, "in_loc": in_loc, "lr": lr,
        "traj_seeds": traj_seeds, "eval_seed": eval_seed,
        "param_names": names, "losses": losses,
        "v_final": v_final, "round_masks": masks,
        "qparams": dump_qparams(model),
        "fp32": fp32.astype(np.float32).tolist(),
        "quant": quant_logits.astype(np.float32).tolist(),
    })
    n_v = sum(len(v) for v in v_final.values())
    print(f"  {name}: {len(losses)} steps, loss {losses[0]:.5f}->{losses[-1]:.5f}, "
          f"{flips}/{n_v} rounding decisions flipped vs nearest")
    assert flips > 0, "trajectory fixture must flip at least one decision"


# ---------------------------------------------------------------------------
# QAT trajectory (runner/qat.py:34-76)
# ---------------------------------------------------------------------------

def qat_traj_case(name, lr=0.05, steps=3, num_classes=10):
    cfg = {"default": {
        "weight": {"n_bits": 8, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "signed": False,
                       "granularity": "layer", "range": {"name": "minmax"}},
        "bn_folding": False,
    }}
    x_shape = (8, 3, 16, 16)
    in_scale, in_loc = 0.6, 0.1
    calib_seeds = [7601, 7602]
    traj_seeds = [7611 + i for i in range(steps)]
    eval_seed = 7620

    model = TrajNet(num_classes)
    names = fill_weights(model)
    model.eval()
    model = reconstruct(model, Configs(cfg))

    def label_of(seed):
        return torch.from_numpy(
            ((np.arange(x_shape[0]) + seed) % num_classes).astype(np.int64))

    # epoch 0 = PTQ calibration (qat.py:51-53 -> ptq.py:71-78)
    set_mode(model, calibrating=True, quantized=False)
    with torch.no_grad():
        for s in calib_seeds:
            model(torch.from_numpy(gen_input(s, x_shape, in_scale, in_loc)))

    # calibrated-epoch switch: optimizer over ALL parameters (qat.py:43-49)
    for p in model.parameters():
        p.requires_grad = True
    opt = torch.optim.SGD(model.parameters(), lr=lr)

    losses = []
    qparams_step1 = None
    for s in traj_seeds:
        set_mode(model, calibrating=False, quantized=True)   # qat.py:55
        img = torch.from_numpy(gen_input(s, x_shape, in_scale, in_loc))
        out = model(img)
        loss = F.cross_entropy(out, label_of(s))             # qat.py:59-60
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
        if qparams_step1 is None:
            # scale/zero after exactly ONE step: the direct pin on the
            # Round.backward gradient composition. Later steps are excluded
            # from value parity — the 1/scale^2 gradient amplification plus
            # round()-boundary crossings make multi-step scale values
            # chaotically sensitive to f32 noise (see test_golden_traj.py)
            qparams_step1 = dump_qparams(model)

    final_sd = {k: np.asarray(v.detach(), np.float32).reshape(-1).tolist()
                for k, v in model.state_dict().items()
                if torch.is_floating_point(v)}

    x_eval = torch.from_numpy(gen_input(eval_seed, x_shape, in_scale, in_loc))
    with torch.no_grad():
        set_mode(model, calibrating=False, quantized=True)
        quant_logits = model(x_eval).numpy().reshape(-1)
        set_mode(model, calibrating=False, quantized=False)
        fp32 = model(x_eval).numpy().reshape(-1)

    CASES.append({
        "case": name, "kind": "qat_traj", "quant_cfg": cfg,
        "num_classes": num_classes, "x_shape": list(x_shape),
        "in_scale": in_scale, "in_loc": in_loc, "lr": lr,
        "calib_seeds": calib_seeds, "traj_seeds": traj_seeds,
        "eval_seed": eval_seed, "param_names": names, "losses": losses,
        "final_state": final_sd, "qparams_step1": qparams_step1,
        "qparams": dump_qparams(model),
        "fp32": fp32.astype(np.float32).tolist(),
        "quant": quant_logits.astype(np.float32).tolist(),
    })
    print(f"  {name}: {len(losses)} steps, loss {losses[0]:.5f}->{losses[-1]:.5f}")


print("generating golden trajectory fixtures from the reference runners")
adaround_traj_case("adaround_traj_w4")
qat_traj_case("qat_traj_w8a8")

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump({"generator": "scripts/gen_golden_traj.py",
               "reference": "JingInAI/Quantize AdaRound + QAT runner loops",
               "cases": CASES}, f)
print(f"wrote {len(CASES)} cases to {OUT}")
