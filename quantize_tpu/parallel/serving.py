"""Continuous-batching inference engine.

North-star capability with no reference counterpart (the reference is a
single-GPU batch-eval script): an asynchronous image-stream server that

* accepts single-image requests from any number of producers,
* coalesces them into fixed-shape batches (padding the tail) so the jitted
  packed-inference graph never recompiles,
* dispatches asynchronously (JAX's async dispatch overlaps host batching
  with device compute), and
* shards each batch over the mesh's ``data`` axis when a mesh is given —
  the per-host feeder pattern for multi-host serving.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class InferenceEngine:
    """Continuous batching over a jittable ``fn(variables, batch) -> out``."""

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        batch_size: int = 32,
        mode: str = "packed",
        mesh=None,
        max_wait_ms: float = 2.0,
        max_queue: int = 4096,
        max_in_flight: int = 4,
        input_dtype=np.float32,
        preprocess=None,
        postprocess=None,
        frame_pool=None,
    ):
        """``input_dtype``/``preprocess``: ship compact pixels. uint8 images
        quarter the host->device ingress (the serving bottleneck both over
        PCIe and over remote tunnels); ``preprocess`` runs ON DEVICE inside
        the jitted forward (default: cast to f32; pass e.g. a normalize fn
        taking and returning the batch).

        ``postprocess``: runs ON DEVICE on the batch output inside the
        jitted forward (e.g. ``lambda o: jnp.argmax(o, -1)`` for top-1).
        Shrinking the per-request result payload matters: the drain
        thread's device->host result fetch is the engine's dominant
        overhead once ingress is out of the way (measured: full
        1000-class logits cost ~3.9 ms/batch of fetch on this runtime —
        docs/BENCH_NOTES.md round 5).

        ``frame_pool``: a DEVICE-RESIDENT (P, H, W, C) array of frames.
        When given, ``submit`` takes an int index into the pool instead of
        an image; batch assembly gathers frames ON DEVICE and the host
        ships only a (B,) int32 index vector per batch. This is the
        deployment shape where frames arrive out-of-band (DMA/disaggregated
        ingest) — and the measurement mode that isolates the engine's OWN
        overhead (queuing, batching window, dispatch, drain) from ingress
        bandwidth."""
        self.model = model
        self.variables = variables
        self.batch_size = int(batch_size)
        self.mode = mode
        self.mesh = mesh
        self.input_dtype = np.dtype(input_dtype)
        self.max_wait_s = max_wait_ms / 1e3
        # Bounded request queue: submit() blocks when full (backpressure).
        self._queue: "queue.Queue[tuple[np.ndarray, Future]]" = queue.Queue(
            maxsize=int(max_queue)
        )
        # Bounded in-flight queue between dispatch and drain: the dispatch
        # thread enqueues un-materialized device arrays (JAX async dispatch)
        # and immediately assembles the next batch; the drain thread blocks
        # on device completion and resolves futures. Up to ``max_in_flight``
        # batches overlap host batching with device compute.
        self._inflight: "queue.Queue[Optional[tuple]]" = queue.Queue(
            maxsize=max(1, int(max_in_flight))
        )
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._drain_thread: Optional[threading.Thread] = None
        if preprocess is None:
            preprocess = lambda x: (x.astype(jnp.float32)  # noqa: E731
                                    if x.dtype != jnp.float32 else x)
        if postprocess is None:
            postprocess = lambda o: o  # noqa: E731
        self.frame_pool = frame_pool
        if frame_pool is not None:
            self.input_dtype = np.dtype(np.int32)
            self._forward = jax.jit(
                lambda v, idx: postprocess(model.apply(
                    v, preprocess(jnp.take(frame_pool, idx, axis=0)),
                    mode=mode))
            )
        else:
            self._forward = jax.jit(
                lambda v, x: postprocess(model.apply(v, preprocess(x),
                                                     mode=mode))
            )
        self.n_processed = 0
        self.n_batches = 0
        self.n_failed = 0
        self.max_observed_in_flight = 0

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "InferenceEngine":
        if self._thread is None:
            self._stop.clear()
            self._drain_thread = threading.Thread(target=self._drain, daemon=True)
            self._drain_thread.start()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        if self._drain_thread is not None:
            self._inflight.put(None)  # sentinel after dispatch loop exits
            self._drain_thread.join(timeout=30)
            self._drain_thread = None

    def __enter__(self) -> "InferenceEngine":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- client API -------------------------------------------------------
    def submit(self, image: np.ndarray) -> Future:
        fut: Future = Future()
        self._queue.put((np.asarray(image, self.input_dtype), fut))
        return fut

    def submit_many(self, images: Sequence[np.ndarray]) -> List[Future]:
        return [self.submit(im) for im in images]

    def stats(self) -> Dict[str, float]:
        return {
            "processed": self.n_processed,
            "batches": self.n_batches,
            "failed": self.n_failed,
            "mean_batch_fill": self.n_processed / max(self.n_batches, 1) / self.batch_size,
            "queue_depth": self._queue.qsize(),
        }

    # -- server loop ------------------------------------------------------
    def _collect(self) -> List[tuple]:
        """Block for the first request, then drain up to batch_size within
        the batching window."""
        items: List[tuple] = []
        try:
            items.append(self._queue.get(timeout=0.05))
        except queue.Empty:
            return items
        deadline = time.perf_counter() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self) -> None:
        while not self._stop.is_set() or not self._queue.empty():
            items = self._collect()
            if not items:
                continue
            n = len(items)
            imgs = np.stack([im for im, _ in items])
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n, *imgs.shape[1:]), imgs.dtype)
                imgs = np.concatenate([imgs, pad])
            x = jnp.asarray(imgs)
            if self.mesh is not None:
                # multi-host aware placement: each host's engine feeds its
                # slice of the global batch (the per-host feeder pattern);
                # single-process this is a plain sharded device_put
                from .input_pipeline import shard_batch_to_mesh

                x = shard_batch_to_mesh(self.mesh, {"img": imgs})["img"]
            try:
                # Async dispatch: returns immediately with a device array;
                # the drain thread materializes it. Next batch assembly
                # overlaps this batch's device time.
                out = self._forward(self.variables, x)
                self.max_observed_in_flight = max(
                    self.max_observed_in_flight, self._inflight.qsize() + 1
                )
                self._inflight.put((out, items))
            except Exception as e:  # propagate dispatch failures to waiters
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
                self.n_failed += n
                continue  # failed batches stay out of the throughput stats
            self.n_processed += n
            self.n_batches += 1

    def _drain(self) -> None:
        """Resolve futures off the dispatch thread: block on device
        completion here so the dispatch loop never does."""
        while True:
            entry = self._inflight.get()
            if entry is None:
                return
            out, items = entry
            try:
                out_np = np.asarray(out)
                for i, (_, fut) in enumerate(items):
                    fut.set_result(out_np[i])
            except Exception as e:
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
