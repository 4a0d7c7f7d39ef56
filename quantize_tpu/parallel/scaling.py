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


def _time_steps(fn, variables, x, iters: int, warmup: int = 2) -> float:
    """Chained-input timing with a hard value fetch per iteration (the only
    scheme that stays within physical bounds on the remote-execution
    runtime — see bench.py::_time)."""
    import jax.numpy as jnp

    seed = jnp.float32(0.0)

    def step(sd):
        out = fn(variables, x + sd)  # distinct input each call: no caching
        return sd + 1e-3 * jnp.tanh(jnp.mean(out).astype(jnp.float32)), out

    for _ in range(warmup):
        seed, out = step(seed)
        float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        seed, out = step(seed)
        float(jnp.sum(out))
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
    mesh = make_mesh(dp=dp, tp=tp, devices=devices)
    xg = jnp.asarray(rng.normal(size=(per_device_batch * dp, image_size,
                                      image_size, 3)).astype(np.float32))
    deploy_sharded = shard_variables(mesh, deploy)
    xg = jax.device_put(xg, NamedSharding(mesh, P("data", None, None, None)))
    # compile ONCE: the AOT executable serves both the HLO census and the
    # timed path (a pod-scale GSPMD compile can take minutes)
    compiled = fn.lower(deploy_sharded, xg).compile()
    stats = collective_stats(compiled.as_text())
    tn = _time_steps(compiled, deploy_sharded, xg, iters)

    global_batch = per_device_batch * dp
    return {
        "model": model_name, "w_bits": w_bits,
        "mesh": {"data": dp, "model": tp}, "n_devices": n_used,
        "platform": jax.devices()[0].platform,
        "per_device_batch": per_device_batch, "global_batch": global_batch,
        "image_size": image_size,
        "t1_ms": t1 * 1e3, "tn_ms": tn * 1e3,
        "img_per_s_per_chip_1dev": per_device_batch / t1,
        "img_per_s_per_chip_ndev": global_batch / tn / n_used,
        "weak_scaling_efficiency": t1 / tn,
        **stats,
    }
