"""Dynamic-batching inference server: the TPU-native serving layer.

The reference has no serving story -- its ``SNN`` is driven eagerly one
batch at a time from the training loop (``/root/reference/src/modules/
snn.py:507-525`` only evaluates dataloaders).  Production TPU serving
wants three things the eager path can't give:

* ONE compiled program at a fixed batch shape -- recompiles cost minutes
  for T=100 Pallas programs (utils/compile_cache.py), so request sizes
  must never leak into the compiled shape;
* request coalescing -- the fused head kernels are latency-bound on the
  serial T-chain, so per-row cost collapses as the batch fills (the
  whole batch rides one kernel dispatch);
* inference-mode forwards -- the custom_vjp primal path runs
  ``store_traces=False`` (no backward residuals in HBM), which is what
  makes large serving batches fit (the (T, B, H) f32 residual alone was
  419 MB at batch 8192).

``InferenceServer`` provides exactly that: callers ``submit`` single
examples or row blocks from any thread and get a ``Future``; a
dispatcher thread coalesces pending rows into a fixed-size zero-padded
batch, runs the jitted pixels->logits forward (the whole-network Pallas
head kernel pair where the config fuses, the XLA scan elsewhere --
models/snn.py:forward_logits_pixels), and resolves each future with its
logits rows.  Padding rows are dead weight the caller never sees; a
request larger than the batch is chunked across successive batches and
re-assembled before its future resolves.
"""
from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .data.datasets import EncodeConfig
from .models import snn as model_lib
from .models.config import SNNConfig

__all__ = ["InferenceServer", "ServerStats"]


class ServerStats:
    """Counters + a latency ring buffer (seconds, submit->resolve)."""

    def __init__(self, capacity: int, window: int = 1024):
        self._capacity = capacity
        self.requests = 0
        self.rows = 0
        self.batches = 0
        self.padded_rows = 0
        self._lat = deque(maxlen=window)
        self._lock = threading.Lock()

    def _record_batch(self, n_real: int, capacity: int) -> None:
        with self._lock:
            self.batches += 1
            self.padded_rows += capacity - n_real

    def _record_request(self, n_rows: int, latency_s: float) -> None:
        with self._lock:
            self.requests += 1
            self.rows += n_rows
            self._lat.append(latency_s)

    def occupancy(self) -> float:
        """Mean fraction of batch rows that were real requests."""
        with self._lock:
            if not self.batches:
                return 0.0
            total = self.batches * self._capacity
            return (total - self.padded_rows) / total

    def latency_percentiles(self, qs=(50, 99)) -> Tuple[float, ...]:
        with self._lock:
            if not self._lat:
                return tuple(0.0 for _ in qs)
            arr = np.asarray(self._lat)
        return tuple(float(np.percentile(arr, q)) for q in qs)

    def snapshot(self) -> dict:
        p50, p99 = self.latency_percentiles()
        return dict(
            requests=self.requests,
            rows=self.rows,
            batches=self.batches,
            occupancy=self.occupancy(),
            latency_p50_s=p50,
            latency_p99_s=p99,
        )


class _Pending:
    """One chunk of one request: resolve ``agg`` once all chunks land."""

    __slots__ = ("rows", "agg", "slot", "t_submit")

    def __init__(self, rows, agg, slot, t_submit):
        self.rows = rows
        self.agg = agg
        self.slot = slot
        self.t_submit = t_submit


class _Aggregator:
    """Re-assembles chunked requests and resolves the caller's Future."""

    def __init__(self, future: Future, n_chunks: int, single: bool,
                 n_rows: int):
        self.future = future
        self.single = single
        self.n_rows = n_rows
        self._parts: List[Optional[np.ndarray]] = [None] * n_chunks
        self._left = n_chunks
        self._lock = threading.Lock()

    def deliver(self, slot: int, part: np.ndarray) -> bool:
        """Store one chunk's logits; True when the request completed."""
        with self._lock:
            self._parts[slot] = part
            self._left -= 1
            done = self._left == 0
        if done:
            out = (
                self._parts[0]
                if len(self._parts) == 1
                else np.concatenate(self._parts, axis=0)
            )
            try:
                # A caller may have cancelled the (pending) future after a
                # result timeout; set_result would raise InvalidStateError
                # and kill the completion thread -- wedging every later
                # request behind the dispatcher's backpressure window.
                if not self.future.cancelled():
                    self.future.set_result(out[0] if self.single else out)
            except Exception:
                pass
        return done

    def fail(self, exc: BaseException) -> None:
        try:
            if not self.future.done():
                self.future.set_exception(exc)
        except Exception:  # cancelled between the check and the set
            pass


class InferenceServer:
    """Coalesce concurrent pixel requests into fixed-shape device batches.

    Parameters
    ----------
    cfg, params:
        The model (canonical per-layer params, e.g. ``trainer.params`` or
        ``SNN.params``).
    batch_size:
        Compiled batch shape.  Larger batches amortize the serial T-chain
        better; the inference-mode forward keeps HBM flat.
    max_delay_s:
        How long the dispatcher waits for more rows after the first
        pending request before running a partial (padded) batch.  The
        knob trades tail latency against occupancy.
    encode_config:
        Spike encoding applied on device inside the compiled program
        (default: TTFS at ``cfg.int_time_steps``, the production config).
    mesh:
        Optional ``jax.sharding.Mesh`` with a "data" axis: params are
        replicated and every batch is sharded over the axis, so one
        server instance serves a whole chip slice (``batch_size`` must
        divide the mesh size).  Single-process meshes only -- multi-host
        serving routes requests per host instead.
    forward_fn:
        Optional override of the compiled per-batch program: a pure
        ``(params, x_f32) -> (batch, n_out)`` function (applied AFTER the
        wire normalization below).  Default is the single-model
        pixels->logits forward (``models/snn.py:forward_logits_pixels``);
        ``EnsembleTrainer.serve`` (parallel/ensemble.py) passes the
        seed-averaged soft-voting probability forward over its stacked
        replicas; any pure function with the same signature works.
    input_dtype, input_scale:
        Wire format.  Host-streamed serving is TRANSFER-bound on
        relay-attached TPUs (the f32 pixel upload dominates the batch),
        and the MNIST-family sources are natively uint8 -- so
        ``input_dtype=np.uint8`` accepts raw bytes and normalizes ON
        DEVICE as ``x.astype(f32) / input_scale`` (default 255.0, the
        torchvision ``ToTensor`` contract, reference datasets.py:120-126)
        inside the compiled program.  One f32 division rounds identically
        on host and device, so logits are bit-equal to a float32 server
        fed ``x / 255`` -- at a quarter of the wire bytes.  uint8 servers
        reject float submissions (a silent float->uint8 truncation would
        corrupt pixels); submit the raw integer bytes.

    Usage::

        with InferenceServer(cfg, params, batch_size=256) as srv:
            fut = srv.submit(pixels)          # (F,) or (B, F), any thread
            logits = fut.result()             # (O,) or (B, O)
            label = srv.classify(pixels)      # synchronous argmax

    ``stats.snapshot()`` reports request/row/batch counts, mean batch
    occupancy, and p50/p99 request latency.
    """

    def __init__(
        self,
        cfg: SNNConfig,
        params,
        *,
        batch_size: int = 256,
        max_delay_s: float = 0.002,
        encode_config: Optional[EncodeConfig] = None,
        mesh=None,
        forward_fn=None,
        input_dtype=np.float32,
        input_scale: Optional[float] = None,
    ):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.max_delay_s = float(max_delay_s)
        self.enc = encode_config or EncodeConfig(n_steps=cfg.int_time_steps)
        self._in_dtype = np.dtype(input_dtype)
        if self._in_dtype not in (np.dtype(np.float32), np.dtype(np.uint8)):
            raise ValueError(
                f"input_dtype must be float32 or uint8, got {self._in_dtype}"
            )
        if input_scale is None:
            input_scale = 255.0 if self._in_dtype == np.uint8 else 1.0
        input_scale = float(input_scale)
        if not np.isfinite(input_scale) or input_scale <= 0.0:
            # A zero/negative/NaN scale would compile fine and silently
            # produce inf/NaN logits on every request; fail at construction.
            raise ValueError(
                f"input_scale must be finite and > 0, got {input_scale}"
            )
        self.input_scale = input_scale
        enc, scale, in_f32 = self.enc, self.input_scale, (
            self._in_dtype == np.dtype(np.float32) and self.input_scale == 1.0
        )
        inner = forward_fn or (
            lambda p, x: model_lib.forward_logits_pixels(cfg, p, x, enc)
        )

        def fwd(p, x):
            if not in_f32:
                # Normalize on device: the uint8 wire bytes become the
                # f32 pixels the model was trained on inside the compiled
                # program (one exact f32 division -- bit-equal to host
                # normalization) instead of on the host side of the wire.
                x = x.astype(jnp.float32) / scale
            return inner(p, x)
        if mesh is not None:
            from .parallel.mesh import batch_sharded, replicated

            if self.batch_size % mesh.size:
                raise ValueError(
                    f"batch_size {self.batch_size} must be a multiple of "
                    f"the mesh size ({mesh.size} devices)"
                )
            self.params = jax.device_put(params, replicated(mesh))
            self._fn = jax.jit(
                fwd,
                in_shardings=(replicated(mesh), batch_sharded(mesh)),
                out_shardings=batch_sharded(mesh),
            )
        else:
            self.params = jax.device_put(params)
            self._fn = jax.jit(fwd)
        self.stats = ServerStats(self.batch_size)
        self._queue: deque = deque()
        self._queued_rows = 0
        self._cv = threading.Condition()
        self._closed = False
        # JAX dispatch is asynchronous: the dispatcher thread enqueues the
        # device program (host->device transfer + kernel) and hands the
        # un-fetched result to the completion thread, which blocks on the
        # device->host fetch and resolves futures.  Batch i+1's pixel
        # transfer therefore overlaps batch i's compute -- on
        # relay-attached TPUs serving is transfer-bound, and the overlap
        # roughly doubles streamed throughput.
        self._done_q: deque = deque()
        self._done_cv = threading.Condition()
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="snn-serve-dispatch", daemon=True
        )
        self._completer = threading.Thread(
            target=self._completion_loop, name="snn-serve-complete",
            daemon=True,
        )
        self._thread.start()
        self._completer.start()

    # -- client surface ----------------------------------------------------
    def submit(self, x) -> Future:
        """Enqueue pixels ``(F,)`` or ``(B, F)``; returns a Future whose
        result is the logits ``(O,)`` / ``(B, O)``.  Thread-safe."""
        if self._in_dtype == np.uint8:
            x = np.asarray(x)
            if x.dtype.kind not in "ui":
                raise ValueError(
                    "this server's wire format is uint8 raw bytes; got "
                    f"dtype {x.dtype} (normalize-by-{self.input_scale:g} "
                    "happens on device -- submit the unnormalized "
                    "integer pixels)"
                )
            if x.dtype != np.uint8:
                if x.size and (x.min() < 0 or x.max() > 255):
                    raise ValueError(
                        "integer pixels out of uint8 range [0, 255]"
                    )
                x = x.astype(np.uint8)
        else:
            x = np.asarray(x, dtype=np.float32)
        single = x.ndim == 1
        rows = x[None] if single else x
        if rows.ndim != 2 or rows.shape[1] != self.cfg.input_size:
            raise ValueError(
                f"expected (F,) or (B, F) pixels with F="
                f"{self.cfg.input_size}, got shape {tuple(x.shape)}"
            )
        fut: Future = Future()
        chunks = [
            rows[i:i + self.batch_size]
            for i in range(0, rows.shape[0], self.batch_size)
        ] or [rows]
        agg = _Aggregator(fut, len(chunks), single, rows.shape[0])
        now = time.monotonic()
        with self._cv:
            if self._closed:
                raise RuntimeError("InferenceServer is closed")
            for slot, chunk in enumerate(chunks):
                self._queue.append(_Pending(chunk, agg, slot, now))
                self._queued_rows += chunk.shape[0]
            self._cv.notify()
        return fut

    def classify(self, x) -> np.ndarray:
        """Synchronous argmax labels for ``(F,)`` / ``(B, F)`` pixels."""
        logits = self.submit(x).result()
        return np.argmax(logits, axis=-1)

    def close(self, drain: bool = True) -> None:
        """Stop the dispatcher.  ``drain=True`` serves remaining queued
        requests first; ``False`` fails their futures."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            self._drain = drain
            self._cv.notify()
        self._thread.join()
        with self._done_cv:
            self._done_q.append(None)  # completion-thread sentinel
            self._done_cv.notify()
        self._completer.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher --------------------------------------------------------
    def _take_batch(self) -> List[_Pending]:
        """Pop pending chunks until the batch is full (holds the lock)."""
        taken, room = [], self.batch_size
        while self._queue and self._queue[0].rows.shape[0] <= room:
            p = self._queue.popleft()
            self._queued_rows -= p.rows.shape[0]
            room -= p.rows.shape[0]
            taken.append(p)
        return taken

    def _dispatch_loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and (not self._queue or not self._drain):
                    pending = list(self._queue)
                    self._queue.clear()
                    self._queued_rows = 0
                    for p in pending:
                        p.agg.fail(RuntimeError("InferenceServer closed"))
                    return
                # Wait (briefly) for a full batch unless closing.
                deadline = self._queue[0].t_submit + self.max_delay_s
                while (
                    self._queued_rows < self.batch_size
                    and not self._closed
                    and time.monotonic() < deadline
                ):
                    self._cv.wait(timeout=deadline - time.monotonic())
                    if not self._queue:
                        break
                if self._closed and not self._drain:
                    continue  # loop top fails the pending futures
                if not self._queue:
                    continue
                taken = self._take_batch()
            if not taken:  # a single over-full... cannot happen (chunked)
                continue
            self._run_batch(taken)

    def _run_batch(self, taken: List[_Pending]) -> None:
        """Dispatch one batch; the (async, un-fetched) result goes to the
        completion thread."""
        n_real = sum(p.rows.shape[0] for p in taken)
        if len(taken) == 1 and n_real == self.batch_size:
            batch = taken[0].rows  # already a full batch: no copy
            spans = [(taken[0], 0, n_real)]
        else:
            batch = np.zeros(
                (self.batch_size, self.cfg.input_size), self._in_dtype
            )
            off = 0
            spans = []
            for p in taken:
                n = p.rows.shape[0]
                batch[off:off + n] = p.rows
                spans.append((p, off, n))
                off += n
        try:
            logits_dev = self._fn(self.params, jnp.asarray(batch))
        except Exception as exc:  # trace/compile failure: fail the batch
            for p, _, _ in spans:
                p.agg.fail(exc)
            return
        self.stats._record_batch(n_real, self.batch_size)
        with self._done_cv:
            # Backpressure: keep a small in-flight window (enough to
            # overlap transfer with compute without pinning unbounded
            # host/device buffers).
            while len(self._done_q) >= 4:
                self._done_cv.wait()
            self._done_q.append((logits_dev, spans))
            self._done_cv.notify()

    def _completion_loop(self) -> None:
        while True:
            with self._done_cv:
                while not self._done_q:
                    self._done_cv.wait()
                item = self._done_q.popleft()
                self._done_cv.notify()  # release dispatcher backpressure
            if item is None:
                return
            logits_dev, spans = item
            try:
                logits = np.asarray(logits_dev)  # blocks on device
            except Exception as exc:  # runtime failure surfaces here
                for p, _, _ in spans:
                    p.agg.fail(exc)
                continue
            t_done = time.monotonic()
            for p, start, n in spans:
                try:
                    if p.agg.deliver(p.slot, logits[start:start + n]):
                        self.stats._record_request(
                            p.agg.n_rows, t_done - p.t_submit
                        )
                except Exception:  # one bad request must not kill the loop
                    p.agg.fail(RuntimeError("delivery failed"))
