"""Emit the full reference-mirroring config corpus.

The reference ships 57 configs organized as family trees
(``configs/runners/{ptq,adaround,qat}/{weight_quantize,activation_quantize,
bias_correct,awq,minmax,mse,cross_entropy}/...``) plus dataset variants.
This script generates the same tree for this framework (same family names,
same quant semantics, our config keys) so the reference's experiment corpus
is runnable as-is.

Run:  python scripts/gen_config_corpus.py   (idempotent; writes configs/)
"""
from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

IMAGENET_BASE = "configs/datasets/imagenet/imagenet.yaml"

W_RANGE = {
    "minmax": "name: minmax\n        percentile: 0.0",
    "mse": "name: mse\n        maxshrink: 0.8\n        grid: 100",
}
A_RANGE = {
    "minmax": "name: minmax\n        percentile: 0.0",
    "mse": "name: mse\n        maxshrink: 0.8\n        grid: 100",
    "aciq": "name: aciq\n        fuse_relu: true",
}


def write(rel: str, text: str) -> None:
    path = os.path.join(REPO, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text.lstrip("\n"))
    print(rel)


def header(runner: str, out: str) -> str:
    return f"""
_base_: [
  '{IMAGENET_BASE}',
]

model:
  name: resnet18
  pretrained: true

runner:
  name: {runner}
{"  verbose: true" if runner != "adaround" else "  verbose: true\n  beta: dynamic"}
"""


def tail(runner: str, out: str) -> str:
    optim = ""
    if runner == "adaround":
        optim = """
optimizer:
  name: adam
  lr: 1e-3

lr_scheduler:
  name: constant
"""
        train = "train:\n  max_epoch: 10\n  print_freq: 10\n  eval_freq: 1"
        bs = 64
    elif runner == "qat":
        optim = """
optimizer:
  name: adam
  lr: 1e-5

lr_scheduler:
  name: constant
"""
        train = ("train:\n  calibrated_epoch: 1\n  max_epoch: 20\n"
                 "  print_freq: 10\n  eval_freq: 1")
        bs = 128
    else:
        train = "train:\n  max_epoch: 1\n  print_freq: 10"
        bs = 128
    return f"""
train_dataset:
  num_shots: 16

train_loader:
  batch_size: {bs}
{optim}
{train}

seed: 1
output_dir: results/{out}/seed1
"""


def weight_quant_block(est: str, gran: str, n_bits: int = 8,
                       adaround: bool = False, bias_correct: bool = False,
                       awq_overrides: bool = False) -> str:
    ar = "\n      adaround:\n        apply: true" if adaround else ""
    bc = "\n    bias_correct:\n      momentum: 0.1" if bias_correct else ""
    awq = ""
    if awq_overrides:
        awq = """

  nn_linear:
    weight:
      range:
        name: awq
        q_group_size: 128
        grid: 20
        accumulate: false

  nn_multiheadattention:
    weight:
      range:
        name: awq
        q_group_size: 128
        grid: 20
        accumulate: false"""
    return f"""
quant:
  default:
    weight:
      n_bits: {n_bits}
      symmetric: true
      signed: true
      granularity: {gran}
      range:
        {W_RANGE[est]}{ar}
    activation:
      n_bits: 32
      range:
        name: minmax
    bn_folding: true{bc}{awq}
"""


def act_quant_block(est: str, gran: str, n_bits: int = 8) -> str:
    # first conv keeps minmax (reference activation_quantize/*.yaml /conv1 override)
    return f"""
quant:
  default:
    weight:
      n_bits: 32
      range:
        name: minmax
    activation:
      n_bits: {n_bits}
      symmetric: false
      granularity: {gran}
      range:
        {A_RANGE[est]}
    bn_folding: true

  /conv1:
    activation:
      range:
        _replace_: true
        name: minmax
        percentile: 0.0
"""


def main() -> None:
    # --- runners/{ptq,adaround,qat}/weight_quantize -----------------------
    for runner in ("ptq", "adaround", "qat"):
        for est in ("minmax", "mse"):
            for gran in ("channel", "layer"):
                name = f"{est}_{gran}"
                out = f"{runner}/weight_quantize/{name}/resnet18/W8"
                write(f"configs/runners/{runner}/weight_quantize/{name}.yaml",
                      header(runner, out)
                      + weight_quant_block(est, gran, adaround=(runner == "adaround"))
                      + tail(runner, out))

    # --- runners/ptq/activation_quantize ----------------------------------
    for est in ("minmax", "mse", "aciq"):
        for gran in ("channel", "layer"):
            name = f"{est}_{gran}"
            out = f"ptq/activation_quantize/{name}/resnet18/A8"
            write(f"configs/runners/ptq/activation_quantize/{name}.yaml",
                  header("ptq", out) + act_quant_block(est, gran)
                  + tail("ptq", out))

    # --- bias_correct families ---------------------------------------------
    for runner, ests in (("ptq", ["minmax", "mse"]), ("adaround", ["minmax", "mse"]),
                         ("qat", ["minmax", "mse"])):
        grans = ("channel", "layer") if runner != "qat" else ("channel",)
        for est in ests:
            for gran in grans:
                name = f"{est}_{gran}"
                out = f"{runner}/bias_correct/{name}/resnet18/W8"
                write(f"configs/runners/{runner}/bias_correct/{name}.yaml",
                      header(runner, out)
                      + weight_quant_block(est, gran, adaround=(runner == "adaround"),
                                           bias_correct=True)
                      + tail(runner, out))

    # --- awq families --------------------------------------------------------
    for runner in ("ptq", "adaround"):
        out = f"{runner}/awq/base/resnet18/W8"
        write(f"configs/runners/{runner}/awq/rn18_w8.yaml",
              header(runner, out)
              + weight_quant_block("mse", "channel", adaround=(runner == "adaround"),
                                   awq_overrides=True)
              + tail(runner, out))
    write("configs/runners/adaround/bias_correct/awq.yaml",
          header("adaround", "adaround/bias_correct/awq/resnet18/W8")
          + weight_quant_block("mse", "channel", adaround=True, bias_correct=True,
                               awq_overrides=True)
          + tail("adaround", "adaround/bias_correct/awq/resnet18/W8"))
    write("configs/runners/ptq/bias_correct/awq.yaml",
          header("ptq", "ptq/bias_correct/awq/resnet18/W8")
          + weight_quant_block("mse", "channel", bias_correct=True,
                               awq_overrides=True)
          + tail("ptq", "ptq/bias_correct/awq/resnet18/W8"))

    # --- joint WxAx configs for minmax/mse/cross_entropy (reference
    #     ptq_rn18_w{4,6,8}a{4,6,8}_bnf_sym_chan_in1k_16shots) ---------------
    for family, base in (("minmax", "configs/runners/ptq/minmax/base.yaml"),
                         ("mse", "configs/runners/ptq/mse/base.yaml"),
                         ("cross_entropy", "configs/runners/ptq/cross_entropy/base.yaml")):
        for b in (4, 6, 8):
            rel = (f"configs/runners/ptq/{family}/"
                   f"ptq_rn18_w{b}a{b}_bnf_sym_chan_in1k_16shots.yaml")
            write(rel, f"""
_base_: [
  '{IMAGENET_BASE}',
  'configs/runners/ptq/base.yaml',
  '{base}',
]

quant:
  default:
    weight:
      n_bits: {b}
    activation:
      n_bits: {b}

seed: 1
output_dir: results/ptq/{family}/ptq_rn18_w{b}a{b}_bnf_sym_chan_in1k/seed1
""")

    # --- dataset variants ----------------------------------------------------
    eval_tf = """
  transform:
    resize:
      size: 256
    center_crop:
      size: 224
    to_tensor: null
    normalize:
      mean: [0.485, 0.456, 0.406]
      std: [0.229, 0.224, 0.225]"""
    for variant, root in (("imagenet_a", "/datasets/ImageNet-A"),
                          ("imagenet_r", "/datasets/ImageNet-R"),
                          ("imagenet_v2", "/datasets/ImageNet-V2"),
                          ("imagenet_sketch", "/datasets/ImageNet-Sketch")):
        write(f"configs/datasets/imagenet/{variant}.yaml", f"""
_base_: configs/datasets/dataloader.yaml

test_dataset:
  name: {variant}
  root: {root}
{eval_tf}
""")
    write("configs/datasets/imagenet/imagenet_c.yaml", f"""
_base_: configs/datasets/dataloader.yaml

test_dataset:
  name: imagenet_c
  root: /datasets/ImageNet-C
  corruption: gaussian_noise
  level: 1
{eval_tf}
""")
    cifar_tf = """
  transform:
    to_tensor: null
    normalize:
      mean: [0.4914, 0.4822, 0.4465]
      std: [0.2470, 0.2435, 0.2616]"""
    write("configs/datasets/cifar/cifar100.yaml", f"""
_base_: configs/datasets/dataloader.yaml

train_dataset:
  name: cifar100
  root: /datasets/cifar
  split: train
{cifar_tf}

val_dataset:
  name: cifar100
  root: /datasets/cifar
  split: test
{cifar_tf}

test_dataset:
  name: cifar100
  root: /datasets/cifar
  split: test
{cifar_tf}
""")
    write("configs/datasets/cifar/cifar10c.yaml", f"""
_base_: configs/datasets/dataloader.yaml

test_dataset:
  name: cifar10c
  root: /datasets/cifar
  corruption: gaussian_noise
  level: 1
{cifar_tf}
""")


if __name__ == "__main__":
    main()
