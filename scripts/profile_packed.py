"""Ground-truth device profile of the packed ResNet-50 W8A8 forward.

Captures a jax.profiler device trace of the benched packed step on the real
TPU and prints a per-op time breakdown (top ops by self-time on the device
lanes), to direct kernel optimization at what is actually hot rather than at
the static roofline model (docs/BENCH_NOTES.md follow-up).

Usage: python scripts/profile_packed.py [--carry bfloat16] [--batch 256]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_trace(trace_dir: str, min_us: float = 1.0):
    """Parse trace.json.gz and aggregate device-lane event durations by name."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device process ids (TPU lanes) by process name metadata
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in proc_names.items()
                if "TPU" in name or "/device" in name.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = float(ev.get("dur", 0.0))
        name = ev.get("name", "?")
        agg[name] += dur
        cnt[name] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    return proc_names, rows, cnt, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--carry", default="bfloat16")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--wbits", type=int, default=8)
    ap.add_argument("--abits", type=int, default=8)
    ap.add_argument("--mode", default="packed")
    ap.add_argument("--fused", action="store_true",
                    help="enable the fused 1x1-conv+residual Pallas epilogue")
    ap.add_argument("--qin", action="store_true",
                    help="int8 quantized-domain residual carries")
    ap.add_argument("--barrier", action="store_true",
                    help="optimization_barrier on quantized conv inputs")
    ap.add_argument("--trace-dir", default="/tmp/qtpu_profile")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    os.environ["BENCH_BATCH"] = str(args.batch)

    import jax
    import jax.numpy as jnp

    import bench

    if args.model.startswith("clip"):
        from bench_clip import build_clip_on_cpu  # the benched build, shared

        model, variables, deploy = build_clip_on_cpu(args.size, args.wbits)
    else:
        model, variables, deploy = bench._build_on_cpu(
            args.size, args.model, args.wbits, args.abits)
    dev = jax.devices()[0]
    print("device:", dev)

    if args.carry not in ("float32", "f32"):
        from quantize_tpu.nn.precision import set_packed_carry_dtype

        set_packed_carry_dtype(args.carry)
    if args.fused:
        from quantize_tpu.nn.precision import set_packed_fused_residual

        set_packed_fused_residual(True)
    if args.qin:
        from quantize_tpu.nn.precision import set_packed_qin_carry

        set_packed_qin_carry(True)
    if args.barrier:
        from quantize_tpu.nn.precision import set_packed_conv_barrier

        set_packed_conv_barrier(True)

    batch, size = args.batch, args.size

    @jax.jit
    def step(v, seed):
        n, h, w, c = batch, size, size, 3
        ih = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 1)
        iw = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 2)
        ic = jax.lax.broadcasted_iota(jnp.float32, (n, h, w, c), 3)
        img = ((ih * 7.1 + iw * 13.3 + ic * 29.7) * 1e-2 + seed) % 2.0 - 1.0
        out = model.apply(v, img, mode=args.mode)
        return seed + 1e-3 * jnp.tanh(jnp.mean(out)) + 1e-3, out

    if args.mode == "packed":
        v_dev = jax.device_put(deploy, dev)
    else:
        v_dev = jax.device_put(
            {"params": variables["params"], "qparams": variables["qparams"]}, dev
        )

    seed = jnp.float32(0.0)
    for _ in range(2):  # warm compile + warm run
        seed, out = step(v_dev, seed)
        float(jnp.sum(out))

    with jax.profiler.trace(args.trace_dir):
        for _ in range(3):
            seed, out = step(v_dev, seed)
            float(jnp.sum(out))

    proc_names, rows, cnt, total = summarize_trace(args.trace_dir)
    print("\nprocesses:", json.dumps(proc_names, indent=None))
    print(f"\ntotal device-lane time: {total/1e3:.3f} ms across 3 steps")

    # map HLO op names -> jax op_name metadata (the compile is cached)
    import re

    meta = {}
    try:
        txt = jax.jit(step).lower(v_dev, jnp.float32(0.0)).compile().as_text()
        for line in txt.splitlines():
            mm = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = ", line)
            om = re.search(r'op_name="([^"]+)"', line)
            if mm and om:
                meta[mm.group(1)] = om.group(1)
    except Exception as e:  # metadata is best-effort
        print(f"(no HLO metadata: {e})")

    def label(name):
        m = meta.get(name, "")
        m = re.sub(r"^jit\(step\)/", "", m)
        return f"{name}  [{m}]" if m else name

    print(f"{'op':<104} {'count':>5} {'total_ms':>9} {'%':>6}")
    for name, dur in rows[: args.top]:
        print(f"{label(name)[:104]:<104} {cnt[name]:>5} {dur/1e3:>9.3f} "
              f"{100*dur/max(total,1e-9):>6.2f}")

    # aggregate by source op_name for a semantic view
    agg2 = defaultdict(float)
    for name, dur in rows:
        if name.startswith("jit_"):
            continue
        m = re.sub(r"^jit\(step\)/", "", meta.get(name, "?"))
        m = re.sub(r"encoder_layer_\d+", "encoder_layer_*", m)
        m = re.sub(r"resblock_\d+", "resblock_*", m)
        m = re.sub(r"(layer\d+_\d+|features_\d+)", "block_*", m)
        agg2[m] += dur
    print("\nby source op (layers merged):")
    for m, dur in sorted(agg2.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{m[:104]:<104} {dur/1e3:>9.3f}")

    unattr = [(n, d) for n, d in rows
              if n not in meta and not n.startswith("jit_")]
    if unattr:
        print("\ntop unattributed trace ops:")
        for n, d in unattr[:12]:
            print(f"{n[:70]:<70} {cnt[n]:>5} {d/1e3:>9.3f}")


if __name__ == "__main__":
    main()
