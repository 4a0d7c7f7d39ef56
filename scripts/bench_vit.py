"""ViT-B/16 W4A8 packed inference benchmark (BASELINE.json's second
headline metric).

Thin wrapper over bench.py: same methodology (CPU-side calibrate+pack,
on-device batch synthesis, BENCH_K seed-chained batches per dispatch, hard
value fetches, bf16-forward baseline for ``vs_baseline``), with the
ViT-B/16 W4A8 defaults. Any BENCH_* env var still overrides.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("BENCH_MODEL", "vit_b_16")
os.environ.setdefault("BENCH_WBITS", "4")
os.environ.setdefault("BENCH_ABITS", "8")
os.environ.setdefault("BENCH_BATCH", "128")
os.environ.setdefault("BENCH_K", "8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

if __name__ == "__main__":
    bench.main()
