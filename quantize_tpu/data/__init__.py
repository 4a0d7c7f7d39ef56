from . import cifar, imagenet, synthetic  # noqa: F401  (registry population)
from .base import DATASETS, ArrayDataset, DataLoader, Datum, build_dataloader, build_dataset
from .synthetic import make_synthetic
from .transforms import TRANSFORMS, build_transform

__all__ = [
    "DATASETS", "ArrayDataset", "DataLoader", "Datum",
    "build_dataloader", "build_dataset", "make_synthetic",
    "TRANSFORMS", "build_transform",
]
