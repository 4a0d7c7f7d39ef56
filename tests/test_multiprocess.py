"""True multi-process distributed test (2 hosts x 4 CPU devices).

The reference cannot do any of this (single-process only, SURVEY.md §2.3).
Spawns two processes that jax.distributed.initialize over localhost, build
a global (data=2, model=4) mesh spanning both, assemble a global batch from
per-host slices, and run a sharded quantized forward — the full multi-host
recipe end to end.
"""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=proc)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.parallel.input_pipeline import host_slice, shard_batch_to_mesh

W8A8 = {"default": {
    "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
               "range": {"name": "minmax"}},
    "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                   "range": {"name": "minmax"}},
    "bn_folding": True}}

devices = np.asarray(jax.devices()).reshape(2, 4)
mesh = Mesh(devices, ("data", "model"))

model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
rng = np.random.default_rng(0)
global_batch = {"img": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
                "label": rng.integers(0, 4, 8).astype(np.int32)}
local = host_slice(global_batch)
sharded = shard_batch_to_mesh(mesh, local)

x0 = jnp.zeros((2, 16, 16, 3), jnp.float32)
variables = dict(model.init(jax.random.PRNGKey(0), x0, mode="calibrate"))
variables.pop("taps", None)
_, upd = model.apply(variables, x0, mode="calibrate", mutable=["qobs", "qparams"])
variables = {**variables, **upd}

fwd = jax.jit(lambda v, img: model.apply(v, img, mode="quant"))
out = fwd(variables, sharded["img"])
local_sum = float(jnp.sum(jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P()))))
print(f"OK proc={proc} out_shape={out.shape} sum={local_sum:.4f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "56789"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.getcwd() + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"OK proc={i}" in out
    # both processes computed the same global result
    s0 = [l for l in outs[0].splitlines() if l.startswith("OK")][0].split("sum=")[1]
    s1 = [l for l in outs[1].splitlines() if l.startswith("OK")][0].split("sum=")[1]
    assert s0 == s1
