"""Headline benchmark: ResNet-50 W8A8 packed inference, images/sec/chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": R}

``vs_baseline`` is the speedup of the fused int8 packed path over the same
model's FP32 forward on the same chip (the reference publishes no throughput
numbers — its packed fast path was disabled, SURVEY.md §6 — so the FP32
forward is the honest baseline).

Each dispatch runs BENCH_K seed-chained batches via ``lax.scan`` (serving
keeps multiple batches in flight per dispatch; each batch's input depends on
the previous batch's output, so nothing can be elided or overlapped) and the
final value is fetched. Device-lane profiles confirm per-batch device time is
identical to single-batch dispatch (~20 ms at batch 256), so the amortized
wall-clock number is physical; it remains conservative (includes the
execution tunnel's per-dispatch overhead, ~25-30 ms, split over K batches).

Calibration + packing run on the local CPU backend (fast local compiles);
only the two benched forwards compile for the TPU. Tunables via env:
BENCH_BATCH / BENCH_SIZE / BENCH_ITERS / BENCH_K / BENCH_BASELINE=0 /
BENCH_CARRY / BENCH_QIN=0 / BENCH_CONV_BARRIER=0 / BENCH_FUSED=0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")


def _build_on_cpu(size: int, model_name: str = "resnet50",
                  w_bits: int = 8, a_bits: int = 8):
    """Calibrate + pack the benched model entirely on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from quantize_tpu.deploy import pack_model
    from quantize_tpu.models import MODELS
    from quantize_tpu.nn.intercept import QuantCtx

    cfg = {
        "default": {
            "weight": {"n_bits": w_bits, "symmetric": True, "signed": True,
                       "granularity": "channel", "range": {"name": "minmax"}},
            "activation": {"n_bits": a_bits, "symmetric": False, "granularity": "layer",
                           "range": {"name": "minmax"}},
            "bn_folding": True,
        }
    }
    model = MODELS.build(model_name, num_classes=1000, ctx=QuantCtx(cfg))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rng = np.random.default_rng(0)
        x_small = jnp.asarray(rng.normal(size=(2, size, size, 3)).astype(np.float32))
        variables = dict(model.init(jax.random.PRNGKey(0), x_small, mode="calibrate"))
        variables.pop("taps", None)
        _, upd = model.apply(variables, x_small, mode="calibrate",
                             mutable=["qobs", "qparams"])
        variables = {**variables, **upd}
        deploy = pack_model(model, variables, x_small)
        deploy = jax.device_get(deploy)
        variables = jax.device_get(variables)
    return model, variables, deploy


def _time(step, v, iters: int, warmup: int = 2) -> float:
    """Per-call chained timing with a sync every iteration.

    Measurement on this remote-execution environment is subtle: identical
    repeated calls are served from a result cache, end-of-chain-only syncs
    under-report, and in-jit scan loops of large model graphs report
    unphysical times. The only scheme that consistently stays within
    physical (roofline) bounds is: distinct chained inputs, one dispatch per
    iteration, block_until_ready each time. This includes the host<->device
    transfer of the batch, so the reported throughput is a conservative
    end-to-end number.
    """
    import jax.numpy as jnp

    seed = jnp.float32(0.0)
    for _ in range(warmup):
        seed, out = step(v, seed)
        float(jnp.sum(out))  # hard value fetch: block_until_ready alone does
        # not guarantee execution completed on this runtime
    t0 = time.perf_counter()
    for _ in range(iters):
        seed, out = step(v, seed)
        float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def _main_mesh(mesh_spec: str) -> None:
    """BENCH_MESH=dpxtp: the 1->N scaling harness (real devices or the
    virtual CPU mesh) — per-device step time, img/s/chip, weak-scaling
    efficiency, and GSPMD collective traffic. One JSON line, same contract
    as the single-chip path."""
    import json as _json

    from quantize_tpu.parallel import measure_scaling

    dp, tp = (int(v) for v in mesh_spec.lower().split("x"))
    r = measure_scaling(
        model_name=os.environ.get("BENCH_MODEL", "resnet50"),
        w_bits=int(os.environ.get("BENCH_WBITS", 8)),
        per_device_batch=int(os.environ.get("BENCH_BATCH", 8)),
        dp=dp, tp=tp,
        image_size=int(os.environ.get("BENCH_SIZE", 64)),
        iters=int(os.environ.get("BENCH_ITERS", 5)),
    )
    print(_json.dumps({
        "metric": f"{r['model']}_w{r['w_bits']}a8_scaling_{dp}x{tp}",
        "value": round(r["img_per_s_per_chip_ndev"], 1),
        "unit": "img/s/chip",
        "vs_baseline": round(r["weak_scaling_efficiency"], 3),
        "baseline": "1-device weak-scaling ideal",
        "detail": r,
    }))


def main() -> None:
    import jax

    mesh_spec = os.environ.get("BENCH_MESH")
    if mesh_spec:
        _main_mesh(mesh_spec)
        return

    model_env = os.environ.get("BENCH_MODEL", "resnet50")
    # default batch follows the model's HEADLINE batch (128 for vit/clip,
    # 256 for CNNs) so `BENCH_MODEL=vit_b_16 python bench.py` updates the
    # headline *_latest.json record, not a _b256-suffixed side record
    batch = int(os.environ.get("BENCH_BATCH", headline_batch_for(model_env)))
    size = int(os.environ.get("BENCH_SIZE", 224))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    k_per_dispatch = int(os.environ.get("BENCH_K", 32))
    run_baseline = os.environ.get("BENCH_BASELINE", "1") != "0"
    baseline_dtype = os.environ.get("BENCH_BASELINE_DTYPE", "bfloat16")
    carry = os.environ.get("BENCH_CARRY", "bfloat16")
    model_name = model_env
    w_bits = int(os.environ.get("BENCH_WBITS", 8))
    a_bits = int(os.environ.get("BENCH_ABITS", 8))
    # int8 block-boundary carries: device-lane profiles showed parity with
    # bf16 carries on ResNet-50 (19.7 vs 20.0 ms/batch @ 256), so the extra
    # skip-path quantization noise isn't bought back — default off
    qin_carry = os.environ.get("BENCH_QIN", "0") != "0"

    model, variables, deploy = _build_on_cpu(size, model_name, w_bits, a_bits)

    dev = jax.devices()[0]
    deploy_dev = jax.device_put(deploy, dev)

    # NOTE: variables are jit *arguments*, not closure constants — baking
    # them in makes XLA constant-fold the packed graph's weight-dependent
    # subexpressions at compile time (minutes-long compiles). The step fn
    # returns a perturbed next input so chained calls are serialized inside
    # one dispatch each.
    import jax.numpy as jnp

    def make_step(mode, in_dtype=None):
        def one(v, seed):
            # synthesize a distinct batch ON DEVICE from a scalar seed: the
            # execution tunnel re-ships large args per call, so neither a
            # chained full-image carry nor a resident base image is free
            n, h, w, c = batch, size, size, 3
            ih = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 1)
            iw = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 2)
            ic = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 3)
            img = ((ih * 7.1 + iw * 13.3 + ic * 29.7) * 1e-2 + seed) % 2.0 - 1.0
            if in_dtype is not None:
                img = img.astype(in_dtype)
            out = model.apply(v, img, mode=mode)
            return seed + 1e-3 * jnp.tanh(jnp.mean(out).astype(jnp.float32)) + 1e-3, out

        if k_per_dispatch <= 1:
            return jax.jit(one)

        @jax.jit
        def step(v, seed):
            def body(carry, _):
                s, out = one(v, carry)
                return s, jnp.mean(out)
            seed, outs = jax.lax.scan(body, seed, None, length=k_per_dispatch)
            return seed, outs  # outs depends on every batch -> full serialization

        return step

    # serving precision: bf16 inter-layer carries (packed mode only; halves
    # inter-layer HBM traffic, accuracy validated in tests/test_precision.py)
    if carry not in ("float32", "f32"):
        from quantize_tpu.nn.precision import set_packed_carry_dtype

        set_packed_carry_dtype(carry)
    if qin_carry:
        # int8 quantized-domain carries across residual blocks (qtensor.py)
        from quantize_tpu.nn.precision import set_packed_qin_carry

        set_packed_qin_carry(True)
    if os.environ.get("BENCH_CONV_BARRIER", "0") != "0":
        # materialize int8 conv inputs (anti-producer-recompute experiment)
        from quantize_tpu.nn.precision import set_packed_conv_barrier

        set_packed_conv_barrier(True)
    if os.environ.get("BENCH_FUSED", "0") != "0":
        # fused 1x1-conv + residual + ReLU Pallas epilogue (qconv1x1.py).
        # Measured SLOWER than the XLA-fused path on v5e (6,462 vs 12,745
        # img/s at batch 256): see docs/BENCH_NOTES.md round-2 addendum.
        # Kept as an opt-in experiment / cross-tested oracle.
        from quantize_tpu.nn.precision import set_packed_fused_residual

        set_packed_fused_residual(True)

    packed_step = make_step("packed")
    t_packed = _time(packed_step, deploy_dev, iters)
    img_s = batch * max(k_per_dispatch, 1) / t_packed
    base_img_s = None

    # Baseline: the same model's unquantized forward at BENCH_BASELINE_DTYPE.
    # bf16 is the honest practitioner baseline on TPU (any serving deployment
    # would run bf16, not f32); BENCH_BASELINE_DTYPE=float32 reverts to the
    # round-1 comparison.
    vs = 1.0
    if run_baseline:
        base_vars = {"params": variables["params"], "qparams": variables["qparams"]}
        if baseline_dtype not in ("float32", "f32"):
            dt = jnp.dtype(baseline_dtype)
            base_vars = {
                "params": jax.tree.map(lambda a: a.astype(dt), base_vars["params"]),
                "qparams": base_vars["qparams"],
            }
            base_step = make_step("fp32", in_dtype=dt)
        else:
            base_step = make_step("fp32")
        variables_dev = jax.device_put(base_vars, dev)
        t_base = _time(base_step, variables_dev, iters)
        base_img_s = batch * max(k_per_dispatch, 1) / t_base

        # Tunnel-degradation retry: the execution tunnel occasionally
        # collapses for a window (observed: the SAME binary measuring 185
        # img/s against a same-window baseline of 110 — both ~25x below
        # record). The baseline forward is the canary: identical code and
        # chip every run, so if it lands far below the last recorded
        # baseline the WINDOW is bad, not the build. Re-time once (cheap:
        # everything is compiled) and keep the healthier pair.
        hb = headline_batch_for(model_name)
        prev = _read_latest_record(
            f"{model_name}_w{w_bits}a{a_bits}_packed_inference",
            suffix="" if batch == hb else f"_b{batch}")
        prev_base = (prev or {}).get("baseline_img_per_s")
        if prev_base and base_img_s < 0.6 * prev_base:
            import sys

            print(f"bench: degraded window (baseline {base_img_s:.0f} vs "
                  f"recorded {prev_base:.0f} img/s); re-timing once",
                  file=sys.stderr)
            time.sleep(10.0)
            t_packed2 = _time(packed_step, deploy_dev, iters)
            t_base2 = _time(base_step, variables_dev, iters)
            if batch * max(k_per_dispatch, 1) / t_base2 > base_img_s:
                t_packed, t_base = t_packed2, t_base2
                img_s = batch * max(k_per_dispatch, 1) / t_packed
                base_img_s = batch * max(k_per_dispatch, 1) / t_base
        vs = round(t_base / t_packed, 3)

    record = {
        "metric": f"{model_name}_w{w_bits}a{a_bits}_packed_inference",
        "value": round(img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": vs,
        "baseline_dtype": baseline_dtype if run_baseline else None,
    }
    if base_img_s is not None:
        record["baseline_img_per_s"] = round(base_img_s, 1)
    # Attach the other headline metric (ViT-B/16 W4A8) when a measurement
    # exists (scripts/bench_vit.py writes results/BENCH_VIT_r*.json). That
    # number is REPLAYED from the newest saved file, not measured by this
    # run — it is tagged with its source path so staleness is visible.
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # newest by mtime: picks up the auto-written *_latest.json from a fresh
    # `python scripts/bench_vit.py` over stale hand-saved round files, and
    # is immune to the lexicographic r9-vs-r10 trap
    vit_paths = sorted(
        glob.glob(os.path.join(here, "results", "BENCH_VIT_r*.json"))
        + glob.glob(os.path.join(
            here, "results",
            "BENCH_vit_b_16_w4a8_packed_inference_latest.json")),
        key=os.path.getmtime)
    if model_name == "resnet50" and vit_paths:
        try:
            with open(vit_paths[-1]) as f:
                record["secondary"] = json.load(f)
            record["secondary_cached_from"] = os.path.relpath(vit_paths[-1], here)
        except Exception:
            pass
    record = write_record(record, batch,
                          headline_batch=headline_batch_for(model_name))
    print(json.dumps(record))


def headline_batch_for(model_name: str) -> int:
    return 128 if model_name.startswith(("vit", "clip")) else 256


def _read_latest_record(metric: str, suffix: str = "") -> "dict | None":
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "results", f"BENCH_{metric}{suffix}_latest.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def write_record(record: dict, batch: int, headline_batch: int) -> dict:
    """Persist a bench record (commit + timestamp + batch) under
    ``results/``. Headline records live under the bare metric name; runs at
    any OTHER batch (latency experiments etc.) get a ``_b{batch}`` suffix
    so they never clobber the throughput record the driver's secondary
    lookup replays. Shared by bench.py and the scripts/bench_*.py writers."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "-C", here, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip() or None
        # A record produced from a dirty tree is not reproducible from its
        # commit field alone — say so in the record. results/ is excluded:
        # bench records are outputs, not code (a prior run's uncommitted
        # record must not taint this run's provenance).
        dirty = bool(subprocess.run(
            ["git", "-C", here, "status", "--porcelain",
             "--untracked-files=no", "--", ".", ":!results"],
            capture_output=True, text=True).stdout.strip())
        if commit and dirty:
            commit += "+dirty"
    except Exception:
        commit = None
    out_rec = dict(record, batch=batch, commit=commit,
                   timestamp=time.strftime("%Y-%m-%dT%H:%M:%S"))
    suffix = "" if batch == headline_batch else f"_b{batch}"
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    # Degraded-window guard: if this run's bf16-baseline canary (identical
    # code every run) still collapsed vs the stored record's after the
    # retry, park the measurement in a _degraded side file instead of
    # clobbering the headline record the driver's secondary lookup replays.
    # Applies only when BOTH records carry the canary; never compares the
    # headline value itself, so it cannot cherry-pick good packed numbers.
    prev = _read_latest_record(record["metric"], suffix)
    nb, pb = out_rec.get("baseline_img_per_s"), (prev or {}).get("baseline_img_per_s")
    degraded = bool(nb and pb and nb < 0.6 * pb)
    name = f"BENCH_{record['metric']}{suffix}_latest.json"
    if degraded:
        out_rec["degraded_window"] = True
        out_rec["recorded_baseline_img_per_s"] = pb
        name = f"BENCH_{record['metric']}{suffix}_degraded_latest.json"
    with open(os.path.join(here, "results", name), "w") as f:
        json.dump(out_rec, f, indent=1)
    return out_rec


if __name__ == "__main__":
    main()
