"""Input-pipeline feed-rate microbenchmark (VERDICT r2 item #7).

Measures JPEG decode throughput through the actual loader path
(``quantize_tpu.data.imagenet.FolderDataset.get_batch`` + the shared
thread decode pool) at two realistic shapes:

* pre-sized 224x224 JPEGs (the serving-cache layout), and
* 500x375 JPEGs decoded then resize(256)+center-crop(224) (the raw
  ImageNet val layout through the transform pipeline).

Prints one JSON line with per-worker and total rates plus the core count
needed to feed a given chip rate (default: the measured ResNet-50 W8A8
rate). The reference's counterpart is torch DataLoader workers
(``dataset/loader.py:14-37``); this pipeline is thread-based because
Pillow releases the GIL during JPEG decode.

Usage: python scripts/bench_decode.py [--n 256] [--chip-rate 12700]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_jpegs(root: str, n: int, w: int, h: int) -> None:
    d = os.path.join(root, "class0")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    for j in range(n):
        # vary content so decode work is realistic, not cache-degenerate
        img = np.roll(base, j * 7, axis=1)
        Image.fromarray(img).save(os.path.join(d, f"{j:04d}.jpg"), quality=90)


def _rate(fn, n: int, reps: int = 3) -> float:
    fn()  # warm (page cache, pool spin-up)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = max(best, n / (time.perf_counter() - t0))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chip-rate", type=float, default=12700.0,
                    help="img/s the chip consumes (ResNet-50 W8A8 measured)")
    args = ap.parse_args()

    from quantize_tpu.data import imagenet as inet
    from quantize_tpu.data.transforms import build_transform

    cores = os.cpu_count() or 1
    n = args.n
    out = {"metric": "jpeg_decode_feed_rate", "unit": "img/s",
           "cores": cores}

    tfm = build_transform({"resize": {"size": 256},
                           "center_crop": {"size": 224}})

    with tempfile.TemporaryDirectory() as root224, \
            tempfile.TemporaryDirectory() as root500:
        _make_jpegs(root224, n, 224, 224)
        _make_jpegs(root500, n, 500, 375)
        idx = np.arange(n)

        for tag, root, transform in (("decode224", root224, None),
                                     ("decode500_resize224", root500, tfm)):
            ds = inet.FolderDataset(root, transform=transform)
            rates = {}
            for workers in (1, cores):
                os.environ["QTPU_DECODE_WORKERS"] = str(workers)
                inet._DECODE_POOL = None  # force pool rebuild at new size
                rates[workers] = round(_rate(lambda: ds.get_batch(idx), n), 1)
            out[tag] = {
                "img_s_1worker": rates[1],
                f"img_s_{cores}workers": rates[cores],
                "scaling": round(rates[cores] / max(rates[1], 1e-9), 2),
                "cores_to_feed_chip": int(np.ceil(
                    args.chip_rate / max(rates[cores] / cores, 1e-9))),
            }

    out["chip_rate"] = args.chip_rate
    print(json.dumps(out))


if __name__ == "__main__":
    main()
