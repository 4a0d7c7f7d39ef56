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


def _materialize_local_rows(out) -> np.ndarray:
    """Fetch a batch output to host — including on a MULTI-PROCESS mesh.

    Single-process (or any fully-addressable array) this is a plain
    ``np.asarray``. Multi-process, the engine's output is a GLOBAL array
    whose rows span hosts and ``np.asarray`` raises ("spans non-addressable
    devices"); but in the per-host feeder pattern each host's sinks cover
    exactly the batch rows IT contributed via
    ``make_array_from_process_local_data``, which live in this process's
    addressable shards. Reassemble those rows: allocate the local row
    range and place every addressable shard at its (row-shifted) index —
    model-axis splits and replicated duplicates land at their own column
    ranges / overwrite with identical data. Assumes the output stays
    batch-sharded over ``data`` like the input (true for per-image models
    under GSPMD); a fully batch-REPLICATED output would reassemble the
    global batch and mis-slice on hosts > 0."""
    if getattr(out, "is_fully_addressable", True):
        return np.asarray(out)
    shards = out.addressable_shards
    row_slices = [s.index[0] if s.index else slice(None) for s in shards]
    lo = min(sl.start or 0 for sl in row_slices)
    hi = max(sl.stop if sl.stop is not None else out.shape[0]
             for sl in row_slices)
    buf = np.empty((hi - lo, *out.shape[1:]), out.dtype)
    for s, rs in zip(shards, row_slices):
        idx = (slice((rs.start or 0) - lo,
                     (rs.stop if rs.stop is not None else out.shape[0]) - lo),
               *s.index[1:])
        buf[idx] = np.asarray(s.data)
    return buf


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
        # Bounded CHUNK queue: submits block when full (backpressure).
        # Entries are chunks ``(imgs[n, ...], sinks)`` where each sink is
        # ``(future, n_requests)`` — one lock round-trip per chunk, not per
        # request. ``submit`` puts chunks of one; ``submit_many`` stacks up
        # to ``batch_size`` requests per entry with per-request futures;
        # ``submit_batch`` additionally collapses a whole chunk onto ONE
        # future resolving to the stacked results (measured: per-request
        # queue ops and Future churn were the engine's limiter past ~5k
        # req/s on a 2-core GIL-contended host — BENCH_NOTES r5).
        # NOTE ``max_queue`` therefore bounds CHUNKS: per-request clients
        # get the old request bound, but batch clients can buffer up to
        # ``max_queue * batch_size`` requests before blocking — size it
        # accordingly (stats()["queue_depth"] likewise counts chunks).
        self._queue: "queue.Queue[tuple[np.ndarray, List[tuple]]]" = queue.Queue(
            maxsize=int(max_queue)
        )
        self._pending: List[tuple] = []  # dispatch-thread-only chunk buffer
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
        self._queue.put((np.asarray(image, self.input_dtype)[None],
                         [(fut, 1)]))
        return fut

    def _put_chunks(self, images, sinks_for) -> List[Future]:
        """Shared chunking for the batch-submission APIs: stack once, put
        one queue entry per ``batch_size`` slice; ``sinks_for(futs, lo, hi)``
        builds the chunk's sinks and appends its futures to ``futs``.

        ``images`` MUST carry a leading request axis (a sequence of images,
        or one stacked ``(n, ...)`` array). A single image cannot be
        distinguished from a stack of rows here — pass ``image[None]`` (or
        use :meth:`submit`)."""
        arr = np.asarray(images, self.input_dtype)
        futs: List[Future] = []
        for lo in range(0, len(arr), self.batch_size):
            hi = min(lo + self.batch_size, len(arr))
            self._queue.put((arr[lo:hi], sinks_for(futs, lo, hi)))
        return futs

    def submit_many(self, images: Sequence[np.ndarray]) -> List[Future]:
        """Batch submission: one queue entry (and one host stack) per up-to-
        ``batch_size`` requests instead of per request. Still one Future per
        request (the i-th future resolves to the i-th request's result)."""
        def sinks(futs, lo, hi):
            new = [Future() for _ in range(hi - lo)]
            futs.extend(new)
            return [(f, 1) for f in new]

        return self._put_chunks(images, sinks)

    def submit_batch(self, images) -> List[Future]:
        """Batch submission with batch RESULTS: each returned future covers
        one chunk of up to ``batch_size`` requests and resolves to the
        stacked ``(n, ...)`` results (the caller slices). Removes the
        per-request Future create/set_result/result() churn entirely — the
        high-throughput client API (a frontend holding many requests calls
        this; per-stream clients use :meth:`submit`)."""
        def sinks(futs, lo, hi):
            fut: Future = Future()
            futs.append(fut)
            return [(fut, hi - lo)]

        return self._put_chunks(images, sinks)

    def stats(self) -> Dict[str, float]:
        return {
            "processed": self.n_processed,
            "batches": self.n_batches,
            "failed": self.n_failed,
            "mean_batch_fill": self.n_processed / max(self.n_batches, 1) / self.batch_size,
            "queue_depth": self._queue.qsize(),
        }

    # -- server loop ------------------------------------------------------
    def _collect(self) -> "tuple[List[tuple], int]":
        """Assemble up to ``batch_size`` requests from leftover chunks and
        the queue (blocking briefly for the first chunk, then draining
        within the batching window). Returns ``(chunks, n_requests)``;
        overflow beyond ``batch_size`` is split and kept for the next batch."""
        pieces = self._pending
        self._pending = []
        total = sum(n for _, sinks in pieces for _, n in sinks)
        if total == 0:
            try:
                c = self._queue.get(timeout=0.05)
            except queue.Empty:
                return pieces, 0
            pieces.append(c)
            total += sum(n for _, n in c[1])
        if total < self.batch_size:
            deadline = time.perf_counter() + self.max_wait_s
            while total < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    c = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                pieces.append(c)
                total += sum(n for _, n in c[1])
        if total > self.batch_size:
            imgs, sinks = pieces.pop()
            n_last = sum(n for _, n in sinks)
            if all(n == 1 for _, n in sinks):
                # per-request sinks split cleanly at the batch boundary
                keep = n_last - (total - self.batch_size)
                pieces.append((imgs[:keep], sinks[:keep]))
                self._pending = [(imgs[keep:], sinks[keep:])]
                total = self.batch_size
            else:
                # a batch-result sink cannot be split mid-future: defer the
                # whole piece (this batch dispatches underfilled; padding
                # handles it). submit_batch chunks at batch_size, so this
                # only triggers when batches interleave mid-chunk.
                self._pending = [(imgs, sinks)]
                total -= n_last
        return pieces, total

    def _loop(self) -> None:
        while (not self._stop.is_set() or not self._queue.empty()
               or self._pending):
            pieces, n = self._collect()
            if n == 0:
                continue
            sinks = [s for _, ss in pieces for s in ss]
            try:
                # Assembly is inside the failure path too: one
                # shape-mismatched request must fail ITS batch's futures,
                # not kill the dispatch thread (which would hang every
                # later submit).
                imgs = (pieces[0][0] if len(pieces) == 1
                        else np.concatenate([p[0] for p in pieces]))
                if n < self.batch_size:
                    pad = np.zeros((self.batch_size - n, *imgs.shape[1:]),
                                   imgs.dtype)
                    imgs = np.concatenate([imgs, pad])
                if self.mesh is not None:
                    # multi-host aware placement: each host's engine feeds
                    # its slice of the global batch (the per-host feeder
                    # pattern); single-process a plain sharded device_put
                    from .input_pipeline import shard_batch_to_mesh

                    x = shard_batch_to_mesh(self.mesh, {"img": imgs})["img"]
                else:
                    x = jnp.asarray(imgs)
                # Async dispatch: returns immediately with a device array;
                # the drain thread materializes it. Next batch assembly
                # overlaps this batch's device time.
                out = self._forward(self.variables, x)
                self.max_observed_in_flight = max(
                    self.max_observed_in_flight, self._inflight.qsize() + 1
                )
                self._inflight.put((out, sinks))
            except Exception as e:  # propagate dispatch failures to waiters
                for fut, _ in sinks:
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
            out, sinks = entry
            try:
                out_np = _materialize_local_rows(out)
                off = 0
                for fut, n in sinks:
                    fut.set_result(out_np[off] if n == 1
                                   else out_np[off:off + n])
                    off += n
            except Exception as e:
                for fut, _ in sinks:
                    if not fut.done():
                        fut.set_exception(e)
