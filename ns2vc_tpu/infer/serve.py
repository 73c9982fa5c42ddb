"""MicroBatcher: group concurrent inference requests into device batches.

The reference serves strictly one clip per call (`Svc.infer`,
reference inference/infer_tool.py:189-206): each request pays the full
sampler latency. On TPU the sampler scan is batch-parallel and the
measured per-chip operating point is B=16 x T<=400 (bench.py; CLAUDE.md:
a single clip costs ~33 ms while a 16-clip batch costs ~180 ms, i.e.
~11 ms/clip — a ~3x throughput lever that the one-clip API cannot
exploit). MicroBatcher is the serving-side piece that realizes it:
callers `submit()` clips from any thread and get a Future; a worker
thread drains the queue, groups requests by content-length bucket (so a
short clip is never padded to a long clip's geometry — each bucket is
one cached XLA program, see Svc._get_infer_fn), and dispatches one
`Svc.infer_batch_async` per bucket.

Batch assembly policy: dispatch when `max_batch` requests of one bucket
are waiting, or when the oldest waiting request has aged `flush_ms`
(latency bound under low load). One refer/speaker per MicroBatcher —
run one instance per conversion target (the prompt conditioning is
per-batch state, reference model.py:605-608).

Pipelining (round-5): dispatch and readback run on SEPARATE threads.
JAX dispatch is asynchronous, so the worker enqueues batch N+1's device
program while the completer thread is still blocked in batch N's host
readback (`np.asarray`) — the two overlap on the device/transfer level.
Round-4 measured the serialized design saturating at ~21 clips/s with
~740 ms readback per dispatch vs 152 ms device time (bench_serving);
the pipeline plus device-side int16 PCM output (`output='pcm16'` in
infer_kwargs, halving D2H bytes) attacks exactly that. `max_inflight`
bounds outstanding device batches (depth 2 = classic double buffering).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

# one definition, shared with Svc's per-bucket jit cache: MicroBatcher's
# grouping and Svc.infer_batch's padding must agree or one serve bucket
# would span several compiled geometries (silent recompiles/lost batching)
from ns2vc_tpu.infer.svc import _bucket


@dataclass
class _Request:
    content: np.ndarray
    f0: Optional[np.ndarray]
    uv: Optional[np.ndarray]
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.monotonic)


class MicroBatcher:
    def __init__(self, svc, refer_mel: np.ndarray,
                 max_batch: int = 16, flush_ms: float = 30.0,
                 bucket_step: int = 64,
                 infer_batch: Optional[Callable] = None,
                 pad_batch: Optional[str] = "pow2",
                 max_inflight: int = 2,
                 readback_threads: int = 1,
                 **infer_kwargs):
        """`svc` is an ns2vc_tpu.infer.svc.Svc (or anything exposing
        `infer_batch(clips, refer_mel, f0s=..., uvs=..., **kw) -> list`;
        `infer_batch` overrides for testing — an override is treated as
        an opaque synchronous call and runs on the completion thread).
        `infer_kwargs` are forwarded per dispatch (sample_method,
        sampling_timesteps, output='pcm16', ...).

        `pad_batch` bounds the set of batch *sizes* that reach the device:
        Svc.infer_batch compiles one XLA program per (batch, length-bucket)
        geometry, and a timeout flush can contain any count in
        [1, max_batch] — unpadded, a serving process would accrete up to
        max_batch compiles per length bucket (each minutes through the
        remote-compile service). "pow2" (default) repeats the last clip up
        to the next power of two (<= 1 + log2(max_batch) programs per
        length bucket, <= 2x padded compute); "max" always pads to
        max_batch (one program); None disables padding. Note the low-load
        latency/energy tradeoff: a timeout-flushed singleton dispatches
        padded device work (up to 2x compute under "pow2", max_batch x
        under "max") — the price of a bounded compile count; pad_batch=None
        restores exact sizes if compiles are already warm.

        `max_inflight` bounds concurrently outstanding device batches:
        1 serializes dispatch and readback (the round-4 behavior), 2
        (default) overlaps batch N+1's device compute with batch N's host
        readback.

        `readback_threads` sizes the completion pool: with 1 (default)
        host readbacks are serial FIFO — the measured round-5 serializer
        once dispatch is pipelined — while >1 lets several batches'
        D2H transfers/`np.asarray` block concurrently (useful when the
        host↔device link itself pipelines; pair with
        max_inflight >= readback_threads + 1 so dispatch still overlaps).
        Batches resolve their own futures, so completion order across
        batches does not matter. With a sync `infer_batch` override the
        whole call runs on a completion thread, so >1 also implies
        concurrent calls into that override."""
        if pad_batch not in (None, "pow2", "max"):
            raise ValueError(f"pad_batch must be None|'pow2'|'max', "
                             f"got {pad_batch!r}")
        if max_inflight < 1:
            raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
        if readback_threads < 1:
            raise ValueError(
                f"readback_threads must be >= 1, got {readback_threads}")
        self.svc = svc
        self.refer_mel = refer_mel
        self.max_batch = max_batch
        self.pad_batch = pad_batch
        self.flush_s = flush_ms / 1e3
        self.bucket_step = bucket_step
        self.infer_kwargs = infer_kwargs
        # (n_real, n_dispatched) per dispatch, appended at dispatch time —
        # serving observability (bench_serving reads it for the batch mix)
        self.dispatch_log: list[tuple[int, int]] = []
        self._infer_sync: Optional[Callable] = None
        self._infer_async: Optional[Callable] = None
        if infer_batch is not None:
            self._infer_sync = infer_batch
        elif hasattr(svc, "infer_batch_async"):
            self._infer_async = svc.infer_batch_async
        else:
            self._infer_sync = svc.infer_batch
        # identity token for Svc's device-resident refer cache: the padded
        # refer uploads once per (batch, length-bucket) geometry instead of
        # per dispatch (it is step-invariant conditioning; one refer per
        # MicroBatcher). The dict holds the token itself, so it can never
        # collide with another instance's key.
        self._refer_token = object()
        self._q: queue.Queue = queue.Queue()
        self._done_q: queue.Queue = queue.Queue()
        self._inflight = threading.Semaphore(max_inflight)
        self._pending: dict[int, list[_Request]] = {}
        self._closed = False
        self._stopping = False
        # orders every submit() put against close()'s sentinel put: a
        # submit that passed the closed-check is guaranteed to enqueue
        # BEFORE the None sentinel, so the worker always drains it
        self._submit_lock = threading.Lock()
        self._completers = [
            threading.Thread(target=self._complete_loop, daemon=True,
                             name=f"ns2vc-mb-readback-{i}")
            for i in range(readback_threads)]
        for t in self._completers:
            t.start()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="ns2vc-microbatcher")
        self._worker.start()

    # -- client side -------------------------------------------------------

    def submit(self, content: np.ndarray, f0: Optional[np.ndarray] = None,
               uv: Optional[np.ndarray] = None) -> Future:
        """Queue one clip ((T, 256) content + optional per-clip f0/uv at
        the mel frame rate, e.g. from Svc.compute_features). Returns a
        Future resolving to the waveform (T*hop,)."""
        content = np.asarray(content)
        # validate here so one malformed clip fails only its own caller,
        # not every co-batched request (infer_batch errors are batch-wide)
        if content.ndim != 2:
            raise ValueError(f"content must be (T, C), got {content.shape}")
        for name, arr in (("f0", f0), ("uv", uv)):
            if arr is not None and np.shape(arr) != (content.shape[0],):
                raise ValueError(
                    f"{name} must be ({content.shape[0]},), got "
                    f"{np.shape(arr)}")
        req = _Request(content, f0, uv)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._q.put(req)
        return req.future

    def close(self, timeout: Optional[float] = None):
        """Flush everything queued, then stop both threads."""
        with self._submit_lock:
            self._closed = True
            self._q.put(None)  # wake the worker
        self._worker.join(timeout)
        for t in self._completers:
            t.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side (batch assembly + device dispatch) ---------------------

    def _oldest_deadline(self) -> Optional[float]:
        t = [reqs[0].t_submit for reqs in self._pending.values() if reqs]
        return (min(t) + self.flush_s) if t else None

    def _absorb(self, items):
        for item in items:
            if item is None:
                self._stopping = True
            else:
                b = _bucket(item.content.shape[0], self.bucket_step)
                self._pending.setdefault(b, []).append(item)

    def _drain(self):
        """Move the whole queue backlog into _pending BEFORE any dispatch
        decision — requests that arrived while this thread was blocked
        (on the queue, or on the in-flight semaphore) must coalesce into
        one batch, not dribble out as aged singletons (measured round 4:
        mean_batch 1.0 at 90 clips/s offered before this rule)."""
        items = []
        while True:
            try:
                items.append(self._q.get_nowait())
            except queue.Empty:
                break
        self._absorb(items)

    def _pick_bucket(self) -> Optional[int]:
        """Dispatchable bucket (full, aged out, or flushing for close)
        whose HEAD request has waited longest — oldest-first keeps a hot
        small-clip bucket from starving a trickle of long clips when the
        in-flight slots are the bottleneck. None when nothing is ready."""
        now = time.monotonic()
        best, best_t = None, None
        for b, reqs in self._pending.items():
            if reqs and (len(reqs) >= self.max_batch or self._stopping
                         or reqs[0].t_submit + self.flush_s <= now):
                if best_t is None or reqs[0].t_submit < best_t:
                    best, best_t = b, reqs[0].t_submit
        return best

    def _run(self):
        while True:
            # block until there is work or the oldest pending batch ages out
            deadline = self._oldest_deadline()
            try:
                wait = (None if deadline is None
                        else max(0.0, deadline - time.monotonic()))
                items = [self._q.get(timeout=wait) if not self._stopping
                         else self._q.get_nowait()]
            except queue.Empty:
                items = []
            self._absorb(items)
            self._drain()

            while True:
                b = self._pick_bucket()
                if b is None:
                    break
                # claim an in-flight slot BEFORE popping the batch: if the
                # pipeline is full this blocks, and everything arriving
                # meanwhile coalesces into the batch we then pop
                self._inflight.acquire()
                self._drain()
                b = self._pick_bucket()
                if b is None:  # arrivals may have been cancels only
                    self._inflight.release()
                    break
                reqs = self._pending[b]
                batch, self._pending[b] = (reqs[: self.max_batch],
                                           reqs[self.max_batch :])
                if not self._start(batch):
                    self._inflight.release()
            self._pending = {b: r for b, r in self._pending.items() if r}

            if self._stopping and not self._pending and self._q.empty():
                # sentinels go in AFTER every batch: each completer drains
                # remaining work first, takes one sentinel, and exits
                for _ in self._completers:
                    self._done_q.put(None)
                return

    def _padded_size(self, n: int) -> int:
        if self.pad_batch == "max":
            return self.max_batch
        if self.pad_batch == "pow2":
            return min(1 << (n - 1).bit_length(), self.max_batch)
        return n

    def _start(self, batch: list[_Request]) -> bool:
        """Assemble + dispatch one batch; hand the readback to the
        completer. Returns False when nothing was handed off (the caller
        releases the in-flight slot)."""
        # claim each future (RUNNING) so a late client-side cancel cannot
        # make set_result raise InvalidStateError mid-loop and poison the
        # rest of the batch; already-cancelled requests drop out here
        batch = [r for r in batch
                 if r.future.set_running_or_notify_cancel()]
        if not batch:
            return False
        use_f0 = any(r.f0 is not None for r in batch)
        try:
            # a mixed batch (some clips without f0) still dispatches as one
            # program: missing contours become all-unvoiced zeros
            f0s = [r.f0 if r.f0 is not None
                   else np.zeros(r.content.shape[0], np.float32)
                   for r in batch] if use_f0 else None
            uvs = [r.uv for r in batch] if use_f0 else None
            clips = [r.content for r in batch]
            n_real = len(clips)
            n_disp = self._padded_size(n_real)
            if n_disp > n_real:  # repeat the last clip; outputs discarded
                clips = clips + [clips[-1]] * (n_disp - n_real)
                if use_f0:
                    f0s = f0s + [f0s[-1]] * (n_disp - n_real)
                    uvs = uvs + [uvs[-1]] * (n_disp - n_real)
            if self._infer_async is not None:
                # enqueues the device program and returns immediately
                # (async dispatch); finish() is the blocking readback
                finish = self._infer_async(
                    clips, self.refer_mel, f0s=f0s, uvs=uvs,
                    refer_cache_key=self._refer_token,
                    **self.infer_kwargs)
            else:
                # opaque sync callable: defer the whole call to the
                # completer thread so this thread keeps assembling batches
                call, kw = self._infer_sync, self.infer_kwargs

                def finish(clips=clips, f0s=f0s, uvs=uvs):
                    return call(clips, self.refer_mel, f0s=f0s, uvs=uvs,
                                **kw)
        except Exception as e:  # dispatch-time failure: fail this batch
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
            return False
        self.dispatch_log.append((n_real, n_disp))
        self._done_q.put((batch, finish, n_disp))
        return True

    # -- completer side (host readback + future resolution) -----------------

    def _complete_loop(self):
        while True:
            item = self._done_q.get()
            if item is None:
                return
            batch, finish, n_disp = item
            try:
                outs = finish()
                if len(outs) != n_disp:
                    raise RuntimeError(
                        f"infer_batch returned {len(outs)} results for "
                        f"{n_disp} clips")
                for r, out in zip(batch, outs):
                    r.future.set_result(out)
            except Exception as e:  # fail every request in the batch
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
            finally:
                self._inflight.release()
