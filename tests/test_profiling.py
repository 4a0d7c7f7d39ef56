"""Roofline accounting tests."""
import jax
import jax.numpy as jnp
import numpy as np

from quantize_tpu.profiling import OpCost, layer_costs, roofline_report


def test_matmul_flops_counted():
    def f(a, b):
        return a @ b

    a = jnp.zeros((128, 256))
    b = jnp.zeros((256, 64))
    costs = layer_costs(f, a, b)
    assert len(costs) == 1
    assert costs[0].flops == 2 * 128 * 256 * 64


def test_conv_flops_counted():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.zeros((1, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 16))
    costs = layer_costs(f, x, w)
    assert len(costs) == 1
    assert costs[0].flops == 2 * (8 * 8 * 16) * (3 * 3 * 4)


def test_roofline_classification():
    big_mm = OpCost("dot_general", flops=2 * 4096**3, bytes=3 * 4096 * 4096, dtype_bits=8)
    assert big_mm.bound("tpu_v5e") == "compute"
    small = OpCost("dot_general", flops=2 * 64, bytes=1e9, dtype_bits=8)
    assert small.bound("tpu_v5e") == "memory"


def test_model_roofline_report():
    from quantize_tpu.models import MODELS

    model = MODELS.build("testcnn", num_classes=4)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    rep = roofline_report(lambda v, i: model.apply(v, i), variables, x)
    assert rep["n_ops"] >= 4  # 2 convs + 2 denses
    assert rep["total_gflops"] > 0
