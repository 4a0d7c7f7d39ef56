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
