"""Generate bit-width sweep configs.

Reproduces the reference's sweep config corpus (``configs/runners/{ptq,qat,
adaround}/{weight,activation}_quantize/``): for each method x granularity,
one config per bit-width W2..W8 (weight-only) or A2..A8 (activation-only),
matching the BASELINE.md accuracy tables row-for-row.

Usage: python scripts/gen_sweeps.py [--out configs/sweeps]
"""
from __future__ import annotations

import argparse
import os

METHODS = {
    "minmax_layer": {"name": "minmax", "granularity": "layer"},
    "minmax_channel": {"name": "minmax", "granularity": "channel"},
    "mse_layer": {"name": "mse", "granularity": "layer"},
    "mse_channel": {"name": "mse", "granularity": "channel"},
    "aciq_layer": {"name": "aciq", "granularity": "layer"},
    "aciq_channel": {"name": "aciq", "granularity": "channel"},
}

TEMPLATE = """_base_: [
  'configs/datasets/imagenet/imagenet.yaml',
  'configs/runners/{runner}/base.yaml',
]

model:
  name: {model}

quant:
  default:
    weight:
      n_bits: {w_bits}
      symmetric: true
      signed: true
      granularity: {granularity}
      range:
        name: {range_name}
    activation:
      n_bits: {a_bits}
      symmetric: false
      granularity: {a_granularity}
      range:
        name: {a_range_name}
    bn_folding: true{bias_correct}

seed: 1
output_dir: results/{runner}/{mode}/{method}/{model}/{tag}/seed1
"""


def gen(out_dir: str, runner: str = "ptq", model: str = "resnet18",
        bias_correct: bool = False) -> int:
    n = 0
    bc = "\n    bias_correct:\n      momentum: 0.1" if bias_correct else ""
    for method, m in METHODS.items():
        for bits in (2, 3, 4, 5, 6, 7, 8):
            # weight-only
            if not method.startswith("aciq"):  # reference aciq is act-only
                path = os.path.join(out_dir, runner, "weight_quantize", method)
                os.makedirs(path, exist_ok=True)
                with open(os.path.join(path, f"w{bits}.yaml"), "w") as f:
                    f.write(TEMPLATE.format(
                        runner=runner, model=model, method=method,
                        w_bits=bits, a_bits=32,
                        granularity=m["granularity"], range_name=m["name"],
                        a_granularity="layer", a_range_name="minmax",
                        bias_correct=bc, mode="weight_quantize", tag=f"W{bits}",
                    ))
                n += 1
            # activation-only
            path = os.path.join(out_dir, runner, "activation_quantize", method)
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, f"a{bits}.yaml"), "w") as f:
                f.write(TEMPLATE.format(
                    runner=runner, model=model, method=method,
                    w_bits=32, a_bits=bits,
                    granularity="channel", range_name="minmax",
                    a_granularity=m["granularity"], a_range_name=m["name"],
                    bias_correct=bc, mode="activation_quantize", tag=f"A{bits}",
                ))
            n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="configs/sweeps")
    ap.add_argument("--runner", default="ptq")
    ap.add_argument("--model", default="resnet18")
    args = ap.parse_args()
    count = gen(args.out, args.runner, args.model)
    print(f"wrote {count} configs under {args.out}")
