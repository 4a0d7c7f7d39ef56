"""Continuous-batching inference engine tests (CPU, packed testcnn)."""
import jax
import jax.numpy as jnp
import numpy as np

from quantize_tpu.deploy import pack_model
from quantize_tpu.models import MODELS
from quantize_tpu.nn.intercept import QuantCtx
from quantize_tpu.parallel import make_mesh
from quantize_tpu.parallel.serving import InferenceEngine

W8A8 = {
    "default": {
        "weight": {"n_bits": 8, "symmetric": True, "granularity": "channel",
                   "range": {"name": "minmax"}},
        "activation": {"n_bits": 8, "symmetric": False, "granularity": "layer",
                       "range": {"name": "minmax"}},
        "bn_folding": True,
    }
}


def _packed_testcnn():
    model = MODELS.build("testcnn", num_classes=4, ctx=QuantCtx(W8A8))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    variables = dict(model.init(jax.random.PRNGKey(0), x, mode="calibrate"))
    variables.pop("taps", None)
    _, upd = model.apply(variables, x, mode="calibrate", mutable=["qobs", "qparams"])
    variables = {**variables, **upd}
    deploy = pack_model(model, variables, x)
    return model, variables, deploy


def test_serving_matches_direct_forward():
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(1)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(11)]

    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=5.0) as eng:
        futs = eng.submit_many(images)
        results = [f.result(timeout=60) for f in futs]

    direct = np.asarray(model.apply(deploy, jnp.asarray(np.stack(images)), mode="packed"))
    np.testing.assert_allclose(np.stack(results), direct, rtol=1e-4, atol=1e-5)
    stats = eng.stats()
    assert stats["processed"] == 11


def test_serving_batches_coalesce():
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(2)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(32)]
    with InferenceEngine(model, deploy, batch_size=8, max_wait_ms=50.0) as eng:
        futs = eng.submit_many(images)
        for f in futs:
            f.result(timeout=60)
    # 32 requests at batch 8 should coalesce into ~4 full batches
    assert eng.n_batches <= 8


def test_serving_overlaps_dispatch_and_drain():
    """The dispatch loop must not block on device completion: with a slow
    drain, >=2 batches should be observed in flight simultaneously."""
    import threading
    import time

    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(4)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(24)]

    eng = InferenceEngine(model, deploy, batch_size=4, max_wait_ms=1.0,
                          max_in_flight=8)
    # Slow the drain thread's materialization so in-flight batches pile up,
    # proving dispatch does not wait on np.asarray(out).
    gate = threading.Event()
    orig_drain = eng._drain

    def slow_drain():
        gate.wait(timeout=10)
        orig_drain()

    eng._drain = slow_drain
    with eng:
        futs = eng.submit_many(images)
        deadline = time.perf_counter() + 10
        while eng.max_observed_in_flight < 2 and time.perf_counter() < deadline:
            time.sleep(0.005)
        gate.set()
        results = [f.result(timeout=60) for f in futs]
    assert eng.max_observed_in_flight >= 2
    direct = np.asarray(
        model.apply(deploy, jnp.asarray(np.stack(images)), mode="packed"))
    # Loose tolerance: different batch shapes fuse differently and can flip
    # int8 rounding at .5 boundaries; exact numerics are covered by
    # test_serving_matches_direct_forward.
    np.testing.assert_allclose(np.stack(results), direct, rtol=5e-2, atol=1e-2)


def test_serving_bounded_queue_backpressure():
    model, _, deploy = _packed_testcnn()
    eng = InferenceEngine(model, deploy, batch_size=4, max_queue=2)
    assert eng._queue.maxsize == 2


def test_serving_on_mesh():
    model, _, deploy = _packed_testcnn()
    mesh = make_mesh(dp=4, tp=1)
    rng = np.random.default_rng(3)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(8)]
    with InferenceEngine(model, deploy, batch_size=8, mesh=mesh, max_wait_ms=50.0) as eng:
        futs = eng.submit_many(images)
        results = [f.result(timeout=60) for f in futs]
    assert all(r.shape == (4,) for r in results)


def test_uint8_ingress_with_on_device_preprocess():
    """uint8 pixel submits + jitted on-device normalize must match f32
    submits of the pre-normalized images (ingress-compression path)."""
    import jax.numpy as jnp

    model, _, variables = _packed_testcnn()
    rng = np.random.default_rng(5)
    imgs8 = [rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
             for _ in range(8)]
    pre = lambda x: x.astype(jnp.float32) / 128.0 - 1.0  # noqa: E731

    with InferenceEngine(model, variables, batch_size=4,
                         input_dtype=np.uint8, preprocess=pre) as eng:
        outs8 = [f.result(timeout=120)
                 for f in eng.submit_many(imgs8)]
    with InferenceEngine(model, variables, batch_size=4) as eng:
        outsf = [f.result(timeout=120)
                 for f in eng.submit_many(
                     [im.astype(np.float32) / 128.0 - 1.0 for im in imgs8])]
    for a, b in zip(outs8, outsf):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_serving_device_resident_frame_pool():
    """Device-feed mode (BENCH_SERVE_FEED=device): requests are int32
    indices into a device-resident frame pool; the engine gathers frames
    in-graph, so per-request results must equal the direct forward on the
    gathered frames and the host never ships pixels."""
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(3)
    pool = jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32))
    idxs = [int(i) for i in rng.integers(0, 6, 13)]

    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=5.0,
                         frame_pool=pool) as eng:
        futs = [eng.submit(i) for i in idxs]
        results = [f.result(timeout=60) for f in futs]

    direct = np.asarray(model.apply(
        deploy, jnp.take(pool, jnp.asarray(idxs), axis=0), mode="packed"))
    np.testing.assert_allclose(np.stack(results), direct, rtol=1e-4, atol=1e-5)
    assert eng.stats()["processed"] == 13


def test_serving_on_device_postprocess():
    """postprocess runs in-graph on the batch output (e.g. top-1): each
    future resolves to the reduced per-request result."""
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(4)
    images = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(9)]
    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=5.0,
                         postprocess=lambda o: jnp.argmax(o, -1)) as eng:
        results = [f.result(timeout=60) for f in eng.submit_many(images)]
    direct = np.argmax(np.asarray(model.apply(
        deploy, jnp.asarray(np.stack(images)), mode="packed")), -1)
    np.testing.assert_array_equal(np.asarray(results), direct)


def test_serving_device_feed_on_mesh():
    """Device-feed serving on a (data=4) mesh: the int32 index batch shards
    on 'data', the frame pool is mesh-replicated, and per-request results
    still match the direct forward — the multi-chip pod serving shape."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, _, deploy = _packed_testcnn()
    mesh = make_mesh(dp=4, tp=1)
    rng = np.random.default_rng(5)
    pool = jax.device_put(
        jnp.asarray(rng.normal(size=(6, 16, 16, 3)).astype(np.float32)),
        NamedSharding(mesh, P()))
    deploy_mesh = jax.device_put(
        deploy, NamedSharding(mesh, P()))
    idxs = [int(i) for i in rng.integers(0, 6, 12)]

    with InferenceEngine(model, deploy_mesh, batch_size=4, max_wait_ms=5.0,
                         mesh=mesh, frame_pool=pool) as eng:
        results = [f.result(timeout=60) for f in (eng.submit(i) for i in idxs)]

    direct = np.asarray(model.apply(
        deploy, jnp.take(pool, jnp.asarray(idxs), axis=0), mode="packed"))
    np.testing.assert_allclose(np.stack(results), direct, rtol=1e-4, atol=1e-5)


def test_submit_batch_chunk_futures():
    """submit_batch returns one future per <=batch_size chunk, each
    resolving to the stacked results — identical values to the
    per-request path and the direct forward."""
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(7)
    images = np.stack([rng.normal(size=(16, 16, 3)).astype(np.float32)
                       for _ in range(11)])

    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=5.0) as eng:
        futs = eng.submit_batch(images)
        chunks = [f.result(timeout=60) for f in futs]

    assert [len(c) for c in chunks] == [4, 4, 3]
    direct = np.asarray(model.apply(deploy, jnp.asarray(images), mode="packed"))
    np.testing.assert_allclose(np.concatenate(chunks), direct,
                               rtol=1e-4, atol=1e-5)
    assert eng.stats()["processed"] == 11


def test_submit_batch_interleaves_with_per_request():
    """Mixed clients: per-request submits landing between submit_batch
    chunks must not corrupt either's results (the unsplittable batch-sink
    defers to the next batch when it straddles a boundary)."""
    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(8)
    singles = [rng.normal(size=(16, 16, 3)).astype(np.float32) for _ in range(3)]
    block = np.stack([rng.normal(size=(16, 16, 3)).astype(np.float32)
                      for _ in range(4)])

    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=20.0) as eng:
        fut_singles = [eng.submit(s) for s in singles]
        fut_block = eng.submit_batch(block)
        res_singles = [f.result(timeout=60) for f in fut_singles]
        res_block = [f.result(timeout=60) for f in fut_block]

    d_singles = np.asarray(model.apply(
        deploy, jnp.asarray(np.stack(singles)), mode="packed"))
    d_block = np.asarray(model.apply(deploy, jnp.asarray(block), mode="packed"))
    np.testing.assert_allclose(np.stack(res_singles), d_singles,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(res_block), d_block,
                               rtol=1e-4, atol=1e-5)


def test_bad_request_fails_its_batch_not_the_engine():
    """A shape-mismatched request must surface as an exception on ITS
    batch's futures — and the dispatch thread must survive to serve
    later, well-formed requests."""
    import pytest

    model, _, deploy = _packed_testcnn()
    rng = np.random.default_rng(9)
    good = rng.normal(size=(16, 16, 3)).astype(np.float32)
    bad = rng.normal(size=(8, 8, 3)).astype(np.float32)

    with InferenceEngine(model, deploy, batch_size=4, max_wait_ms=5.0) as eng:
        f_good0 = eng.submit(good)
        f_bad = eng.submit(bad)  # same window: np.concatenate must fail
        with pytest.raises(Exception):
            f_bad.result(timeout=60)
        with pytest.raises(Exception):
            f_good0.result(timeout=60)  # batchmate shares the failure
        # engine must still be alive for the next batch
        f_after = eng.submit(good)
        res = f_after.result(timeout=60)

    direct = np.asarray(model.apply(deploy, jnp.asarray(good[None]),
                                    mode="packed"))[0]
    np.testing.assert_allclose(res, direct, rtol=1e-4, atol=1e-5)
    assert eng.stats()["failed"] >= 2


def test_materialize_local_rows_reassembles_sharded_output():
    """The drain path's multi-host materializer: on a (data, model)-sharded
    2-D output, shard-index reassembly must reproduce the full array. A
    single process owns every shard (fully addressable -> plain asarray),
    so the reassembly branch is exercised through a wrapper that reports
    the array as not fully addressable — the shard/index arithmetic is
    identical to the multi-process case where only a row range is local."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quantize_tpu.parallel.serving import _materialize_local_rows

    mesh = make_mesh(dp=4, tp=2)
    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    arr = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", "model")))

    class _NotFullyAddressable:
        is_fully_addressable = False

        def __init__(self, a):
            self._a = a

        def __getattr__(self, k):
            return getattr(self._a, k)

    np.testing.assert_array_equal(_materialize_local_rows(arr), x)
    np.testing.assert_array_equal(
        _materialize_local_rows(_NotFullyAddressable(arr)), x)
    # 1-D output (e.g. on-device top-1): row-only shards
    y = np.arange(8, dtype=np.int32)
    arr1 = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(
        _materialize_local_rows(_NotFullyAddressable(arr1)), y)
