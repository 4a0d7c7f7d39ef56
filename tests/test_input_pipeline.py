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


def test_dataloader_workers_preserve_order_and_content():
    """num_workers>0 pipelines get_batch calls but must yield identical
    batches in identical order to the serial loader."""
    import numpy as np

    from quantize_tpu.data.base import ArrayDataset, DataLoader

    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.normal(size=(37, 4, 4, 3)).astype(np.float32),
                      rng.integers(0, 5, size=37))
    serial = list(DataLoader(ds, batch_size=8, shuffle=True, seed=3))
    workers = list(DataLoader(ds, batch_size=8, shuffle=True, seed=3, num_workers=4))
    assert len(serial) == len(workers)
    for a, b in zip(serial, workers):
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_folder_dataset_threaded_decode(tmp_path):
    """Thread-pool decode returns images in index order."""
    import numpy as np
    from PIL import Image

    from quantize_tpu.data.imagenet import FolderDataset

    root = tmp_path / "val"
    d = root / "class0"
    d.mkdir(parents=True)
    for j in range(16):
        Image.fromarray(np.full((8, 8, 3), j * 10, np.uint8)).save(d / f"{j:02d}.png")

    ds = FolderDataset(str(root))
    batch = ds.get_batch(np.arange(16))
    for j in range(16):
        assert batch["img"][j, 0, 0, 0] == j * 10


def test_dataloader_decode_throughput(tmp_path):
    """Loader microbenchmark: threaded decode must beat serial decode on a
    multi-core host (VERDICT item 7 'done' criterion, scaled to CI size)."""
    import os
    import time

    import numpy as np
    from PIL import Image

    from quantize_tpu.data import imagenet as inet

    if (os.cpu_count() or 1) < 4:
        import pytest

        pytest.skip("needs >=4 cores")

    root = tmp_path / "val"
    d = root / "class0"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for j in range(64):
        Image.fromarray(rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)).save(
            d / f"{j:03d}.jpg", quality=90)

    ds = inet.FolderDataset(str(root))
    idx = np.arange(64)

    old = os.environ.get("QTPU_DECODE_WORKERS")
    try:
        os.environ["QTPU_DECODE_WORKERS"] = "1"
        ds.get_batch(idx)  # warm page cache
        t0 = time.perf_counter()
        ds.get_batch(idx)
        t_serial = time.perf_counter() - t0

        os.environ["QTPU_DECODE_WORKERS"] = str(min(16, os.cpu_count()))
        ds.get_batch(idx)  # warm the pool
        t0 = time.perf_counter()
        ds.get_batch(idx)
        t_pool = time.perf_counter() - t0
    finally:
        if old is None:
            os.environ.pop("QTPU_DECODE_WORKERS", None)
        else:
            os.environ["QTPU_DECODE_WORKERS"] = old
    assert t_pool < t_serial * 0.9, (t_serial, t_pool)


def test_folder_index_and_fewshot_cache(tmp_path, monkeypatch):
    """Reference parity (imagenet.py:47-84): the folder index and per-(seed,
    shots) few-shot split are pickle-cached — a second construction does
    ZERO directory walking — and invalidate on tree mtime change."""
    import os
    import numpy as np
    from PIL import Image

    import quantize_tpu.data.imagenet as inet

    monkeypatch.setenv("QTPU_CACHE_DIR", str(tmp_path / "cache"))
    root = tmp_path / "train"
    for ci in range(3):
        d = root / f"class{ci}"
        d.mkdir(parents=True)
        for j in range(4):
            Image.fromarray(
                np.full((8, 8, 3), ci * 40 + j, np.uint8)).save(d / f"{j}.png")

    ds1 = inet.FolderDataset(str(root))
    fs1 = ds1.few_shot(2, seed=7)
    assert len(ds1) == 12 and len(fs1) == 6

    # second run: index + split served from cache, no listdir of class dirs
    real_listdir = os.listdir
    walked = []

    def spy(p):
        walked.append(p)
        return real_listdir(p)

    monkeypatch.setattr(inet.os, "listdir", spy)
    ds2 = inet.FolderDataset(str(root))
    fs2 = ds2.few_shot(2, seed=7)
    assert [p for p in walked if "class" in os.path.basename(p)] == []
    assert ds2.paths == ds1.paths and ds2.labels_list == ds1.labels_list
    assert fs2.paths == fs1.paths

    # different seed -> different cache entry, same determinism
    assert ds2.few_shot(2, seed=8).paths == ds1.few_shot(2, seed=8).paths

    # tree change invalidates: new image appears in the re-walked index
    monkeypatch.setattr(inet.os, "listdir", real_listdir)
    Image.fromarray(np.full((8, 8, 3), 9, np.uint8)).save(
        root / "class0" / "zz.png")
    os.utime(root / "class0")
    ds3 = inet.FolderDataset(str(root))
    assert len(ds3) == 13
