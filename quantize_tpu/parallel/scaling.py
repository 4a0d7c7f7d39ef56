"""1->N scaling measurement harness.

The reference is single-device, so scaling is pure new capability
(SURVEY.md §2.3): this module measures — on a real pod OR the virtual CPU
mesh — what the north star asks for: per-device step time, achieved
img/s/chip, weak-scaling efficiency vs the 1-device run, and the
collective traffic GSPMD inserted (op counts + bytes, parsed from the
compiled HLO, plus an ICI-time estimate against the chip's link bandwidth).

One call produces the whole artifact; ``bench.py`` (``BENCH_MESH=dpxtp``)
and ``__graft_entry__.dryrun_multichip`` both route through here, so the
harness that will run on a pod is the same code that is pinned by the
CPU-mesh test today (``tests/test_scaling.py``).
"""
from __future__ import annotations

import re
import time
from typing import Any, Dict, Optional

import numpy as np

# v5e ICI: 4 links per chip at ~100 GB/s each direction; usable all-reduce
# bandwidth depends on topology and algorithm, so the estimate uses a
# conservative 90 GB/s effective per chip. We report raw bytes alongside so
# the reader can apply their own bandwidth model.
_ICI_BYTES_PER_S = 90e9

# async collectives appear as <op>-start / <op>-done pairs in optimized
# HLO; counting the bare substring would double-count them, so the suffix
# is captured and '-done' lines are skipped. The result type (everything
# between '=' and the op name) may be a tuple — e.g. TPU all-reduce-start
# returns (operand_alias, result) and multi-operand variants nest further —
# so EVERY dtype[dims] group in it is parsed, not just the first.
_COLLECTIVE_RE = re.compile(
    r"=\s*([^=]*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start|-done)?\("
)

_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([\d,]*)\]")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "s4": 0.5, "u4": 0.5, "pred": 1,
                "f64": 8, "s64": 8, "s16": 2, "u16": 2, "f8": 1,
                "c64": 8, "c128": 16}


def collective_stats(hlo_text: str) -> Dict[str, Any]:
    """Count GSPMD-inserted collectives and their payload bytes in an
    optimized HLO module text.

    Tuple-shaped async starts: when the result tuple is the duplicated
    in/out alias pattern ``(X..., X...)`` the payload is counted once, not
    twice; any other structure counts every element (possible overcount is
    preferred to silently understating traffic). Unrecognized dtypes fall
    back to 4 bytes and are reported in ``unknown_dtypes`` so the artifact
    reader can see when the byte figure is an estimate."""
    counts: Dict[str, int] = {}
    total_bytes = 0.0
    unknown = set()
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        result_type, op, suffix = m.group(1), m.group(2), m.group(3)
        if suffix == "-done":
            continue  # the matching -start already counted this collective
        counts[op] = counts.get(op, 0) + 1
        shapes = _SHAPE_RE.findall(result_type)
        half = len(shapes) // 2
        if (suffix == "-start" and len(shapes) % 2 == 0 and half
                and shapes[:half] == shapes[half:]):
            shapes = shapes[:half]  # (operand alias, result) duplication
        for dtype, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d.strip().isdigit():
                    n *= int(d)
            if dtype not in _DTYPE_BYTES:
                unknown.add(dtype)
            total_bytes += n * _DTYPE_BYTES.get(dtype, 4)
    out = {"collective_counts": counts,
           "collective_bytes_per_step": total_bytes,
           "est_ici_ms": total_bytes / _ICI_BYTES_PER_S * 1e3}
    if unknown:
        out["unknown_dtypes"] = sorted(unknown)
    return out


def _time_steps(fn, variables, x, iters: int, warmup: int = 2,
                fetch=None) -> float:
    """Chained-input timing with a hard value fetch per iteration (the only
    scheme that stays within physical bounds on the remote-execution
    runtime — see bench.py::_time). ``fetch`` overrides the sync (multi-
    process outputs are not fully addressable, so the fetch must reduce to
    a replicated scalar first)."""
    import jax.numpy as jnp

    fetch = fetch or (lambda out: float(jnp.sum(out)))
    seed = jnp.float32(0.0)

    def step(sd):
        out = fn(variables, x + sd)  # distinct input each call: no caching
        return sd + 1e-3 * jnp.tanh(jnp.mean(out).astype(jnp.float32)), out

    for _ in range(warmup):
        seed, out = step(seed)
        fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        seed, out = step(seed)
        fetch(out)
    return (time.perf_counter() - t0) / iters


def measure_scaling(
    model_name: str = "resnet50",
    w_bits: int = 8,
    per_device_batch: int = 8,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    image_size: int = 64,
    num_classes: int = 100,
    iters: int = 5,
    devices=None,
) -> Dict[str, Any]:
    """Measure packed-inference scaling on a (dp x tp) mesh vs 1 device.

    Weak scaling: the per-device batch is constant, so ideal N-device step
    time equals the 1-device step time; ``efficiency = t1 / tN``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..deploy import pack_model
    from ..models import MODELS
    from ..nn.intercept import QuantCtx
    from .input_pipeline import host_slice, shard_batch_to_mesh
    from .mesh import make_mesh, shard_variables

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = (2, n // 2) if n % 2 == 0 and n > 1 else (1, n)
    dp, tp = dp or 1, tp or 1
    n_used = dp * tp

    cfg = {"default": {
        "weight": {"n_bits": w_bits, "symmetric": True, "signed": True,
                   "granularity": "channel", "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True}}
    model = MODELS.build(model_name, num_classes=num_classes,
                         ctx=QuantCtx(cfg))

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(per_device_batch, image_size,
                                      image_size, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x1, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x1, mode="calibrate",
                         mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x1)

    fn = jax.jit(lambda v, img: model.apply(v, img, mode="packed"))

    # -- 1-device baseline (same per-device batch) ------------------------
    t1 = _time_steps(fn, deploy, x1, iters)

    # -- N-device sharded run --------------------------------------------
    # Multi-process: the same harness works across hosts — the global batch
    # is assembled from per-host slices (input_pipeline.host_slice), the
    # variables go through the make_array path in shard_variables, and the
    # per-iteration sync reduces to a replicated scalar first (a multi-host
    # output is not fully addressable). Supported layout: the 'data' axis
    # spans the process boundary.
    multiprocess = jax.process_count() > 1
    mesh = make_mesh(dp=dp, tp=tp, devices=devices)
    xg_np = rng.normal(size=(per_device_batch * dp, image_size,
                             image_size, 3)).astype(np.float32)
    deploy_sharded = shard_variables(mesh, deploy)
    if multiprocess:
        xg = shard_batch_to_mesh(mesh, host_slice({"img": xg_np}))["img"]
        red = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)),
                      out_shardings=NamedSharding(mesh, P()))
        fetch = lambda out: float(np.asarray(red(out).addressable_data(0)))  # noqa: E731
    else:
        xg = jax.device_put(jnp.asarray(xg_np),
                            NamedSharding(mesh, P("data", None, None, None)))
        fetch = None
    # compile ONCE: the AOT executable serves both the HLO census and the
    # timed path (a pod-scale GSPMD compile can take minutes)
    compiled = fn.lower(deploy_sharded, xg).compile()
    stats = collective_stats(compiled.as_text())
    tn = _time_steps(compiled, deploy_sharded, xg, iters, fetch=fetch)

    global_batch = per_device_batch * dp
    return {
        "model": model_name, "w_bits": w_bits,
        "mesh": {"data": dp, "model": tp}, "n_devices": n_used,
        "n_processes": jax.process_count(),
        "platform": jax.devices()[0].platform,
        "per_device_batch": per_device_batch, "global_batch": global_batch,
        "image_size": image_size,
        "t1_ms": t1 * 1e3, "tn_ms": tn * 1e3,
        "img_per_s_per_chip_1dev": per_device_batch / t1,
        "img_per_s_per_chip_ndev": global_batch / tn / n_used,
        "weak_scaling_efficiency": t1 / tn,
        **stats,
    }


_MP_WORKER = r"""
import json, os, sys
proc, nproc, port, devs, dp, tp = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], int(sys.argv[4]),
                                   int(sys.argv[5]), int(sys.argv[6]))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=proc)
from quantize_tpu.parallel.scaling import measure_scaling
r = measure_scaling(model_name=sys.argv[7], w_bits=int(sys.argv[8]),
                    per_device_batch=int(sys.argv[9]), dp=dp, tp=tp,
                    image_size=int(sys.argv[10]), num_classes=16,
                    iters=int(sys.argv[11]))
if jax.process_index() == 0:
    print("MPSCALING " + json.dumps(r), flush=True)
else:
    print("MPOK", flush=True)
"""


def run_multiprocess_scaling(
    n_processes: int = 2,
    devices_per_process: int = 4,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    model_name: str = "resnet18",
    w_bits: int = 8,
    per_device_batch: int = 2,
    image_size: int = 32,
    iters: int = 2,
    port: Optional[int] = None,
    timeout: float = 420.0,
) -> Dict[str, Any]:
    """Run ``measure_scaling`` across a REAL process boundary: spawns
    ``n_processes`` workers that ``jax.distributed.initialize`` over
    localhost with ``devices_per_process`` virtual CPU devices each, build
    the global (dp x tp) mesh spanning both, and execute the identical
    harness (per-host input slices, make-array variable placement, the
    GSPMD census on the compiled multi-host HLO). Returns process 0's
    result row. This is the DCN-ish rehearsal the pod artifact needs — the
    single-process virtual mesh never crosses an ICI/DCN-like boundary.

    ``port=None`` (default) picks a free ephemeral coordinator port per
    run, so a crashed/killed previous run cannot poison this one; workers
    are ALWAYS killed on timeout or error (no orphan holding the port).
    """
    import json
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    dp = dp if dp is not None else n_processes
    tp = tp if tp is not None else devices_per_process * n_processes // dp
    if port is None:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "mp_scaling_worker.py")
        with open(script, "w") as f:
            f.write(_MP_WORKER)
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        env.pop("XLA_FLAGS", None)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        args = [str(devices_per_process), str(dp), str(tp), model_name,
                str(w_bits), str(per_device_batch), str(image_size),
                str(iters)]
        procs = [
            subprocess.Popen(
                [sys.executable, script, str(i), str(n_processes),
                 str(port), *args],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env, text=True)
            for i in range(n_processes)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out)
        finally:
            # a hung or failed worker must not outlive the call: an orphan
            # would hold the coordinator port and leak a JAX CPU process
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        for i, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(
                    f"multiprocess scaling worker {i} failed:\n{out[-3000:]}")
        line = next(l for l in outs[0].splitlines()
                    if l.startswith("MPSCALING "))
        return json.loads(line[len("MPSCALING "):])
