"""Multi-host input pipeline: host slicing, mesh sharding, prefetch."""
import jax
import jax.numpy as jnp
import numpy as np

from quantize_tpu.data import DataLoader, make_synthetic
from quantize_tpu.parallel import make_mesh
from quantize_tpu.parallel.input_pipeline import (
    PrefetchIterator, host_slice, prefetch_to_mesh, shard_batch_to_mesh,
)


def test_host_slice():
    batch = {"img": np.arange(16).reshape(16, 1), "label": np.arange(16)}
    s0 = host_slice(batch, process_index=0, process_count=4)
    s3 = host_slice(batch, process_index=3, process_count=4)
    assert len(s0["img"]) == 4 and s0["label"][0] == 0
    assert s3["label"][0] == 12


def test_shard_batch_to_mesh():
    mesh = make_mesh(dp=8, tp=1)
    batch = {"img": np.zeros((16, 8, 8, 3), np.float32), "label": np.zeros(16, np.int32)}
    out = shard_batch_to_mesh(mesh, batch)
    assert out["img"].sharding.spec == jax.sharding.PartitionSpec("data", None, None, None)


def test_prefetch_iterator_yields_all():
    ds = make_synthetic(n=64, image_size=8)
    loader = DataLoader(ds, batch_size=16)
    seen = 0
    for batch in prefetch_to_mesh(loader, mesh=None, prefetch=2):
        seen += len(batch["label"])
    assert seen == 64


def test_prefetch_on_mesh_end_to_end():
    mesh = make_mesh(dp=4, tp=2)
    ds = make_synthetic(n=32, image_size=8)
    loader = DataLoader(ds, batch_size=8)
    total = 0
    for batch in prefetch_to_mesh(loader, mesh=mesh):
        total += int(jnp.sum(jnp.ones_like(batch["label"])))
    assert total == 32


def test_folder_dataset_subclass_split(tmp_path):
    """Base/new split: first half of classes -> base, rest -> new, labels
    re-indexed (reference imagenet.py:140-181)."""
    import numpy as np
    from PIL import Image

    from quantize_tpu.data.imagenet import FolderDataset

    root = tmp_path / "val"
    for ci in range(5):
        d = root / f"class{ci}"
        d.mkdir(parents=True)
        for j in range(2):
            Image.fromarray(
                np.full((8, 8, 3), ci * 40 + j, np.uint8)).save(d / f"{j}.png")

    ds = FolderDataset(str(root))
    base = ds.select_subclass("base")
    new = ds.select_subclass("new")
    assert base.num_classes == 3 and new.num_classes == 2  # ceil(5/2)=3
    assert len(base) == 6 and len(new) == 4
    assert sorted(np.unique(base.labels).tolist()) == [0, 1, 2]
    assert sorted(np.unique(new.labels).tolist()) == [0, 1]
    assert base.classnames == ["class0", "class1", "class2"]
    assert new.classnames == ["class3", "class4"]
    assert ds.select_subclass("all") is ds
