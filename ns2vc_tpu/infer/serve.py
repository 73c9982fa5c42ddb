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
`Svc.infer_batch` per bucket.

Batch assembly policy: dispatch when `max_batch` requests of one bucket
are waiting, or when the oldest waiting request has aged `flush_ms`
(latency bound under low load). One refer/speaker per MicroBatcher —
run one instance per conversion target (the prompt conditioning is
per-batch state, reference model.py:605-608).
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
                 **infer_kwargs):
        """`svc` is an ns2vc_tpu.infer.svc.Svc (or anything exposing
        `infer_batch(clips, refer_mel, f0s=..., uvs=..., **kw) -> list`;
        `infer_batch` overrides the bound method for testing).
        `infer_kwargs` are forwarded per dispatch (sample_method,
        sampling_timesteps, auto_predict_f0, ...).

        `pad_batch` bounds the set of batch *sizes* that reach the device:
        Svc.infer_batch compiles one XLA program per (batch, length-bucket)
        geometry, and a timeout flush can contain any count in
        [1, max_batch] — unpadded, a serving process would accrete up to
        max_batch compiles per length bucket (each minutes through the
        remote-compile service). "pow2" (default) repeats the last clip up
        to the next power of two (<= 1 + log2(max_batch) programs per
        length bucket, <= 2x padded compute); "max" always pads to
        max_batch (one program); None disables padding."""
        if pad_batch not in (None, "pow2", "max"):
            raise ValueError(f"pad_batch must be None|'pow2'|'max', "
                             f"got {pad_batch!r}")
        self.svc = svc
        self.refer_mel = refer_mel
        self.max_batch = max_batch
        self.pad_batch = pad_batch
        self.flush_s = flush_ms / 1e3
        self.bucket_step = bucket_step
        self.infer_kwargs = infer_kwargs
        self._infer_batch = infer_batch or svc.infer_batch
        self._q: queue.Queue = queue.Queue()
        self._pending: dict[int, list[_Request]] = {}
        self._closed = False
        # orders every submit() put against close()'s sentinel put: a
        # submit that passed the closed-check is guaranteed to enqueue
        # BEFORE the None sentinel, so the worker always drains it
        self._submit_lock = threading.Lock()
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
        """Flush everything queued, then stop the worker."""
        with self._submit_lock:
            self._closed = True
            self._q.put(None)  # wake the worker
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker side -------------------------------------------------------

    def _oldest_deadline(self) -> Optional[float]:
        t = [reqs[0].t_submit for reqs in self._pending.values() if reqs]
        return (min(t) + self.flush_s) if t else None

    def _run(self):
        stopping = False
        while True:
            # block until there is work or the oldest pending batch ages out
            deadline = self._oldest_deadline()
            try:
                wait = (None if deadline is None
                        else max(0.0, deadline - time.monotonic()))
                items = [self._q.get(timeout=wait) if not stopping
                         else self._q.get_nowait()]
            except queue.Empty:
                items = []
            # drain the whole backlog into _pending BEFORE any dispatch
            # decision: _dispatch blocks this thread for the full device
            # call, so requests that arrived meanwhile are sitting in _q.
            # Taking one per iteration would pair an always-expired flush
            # deadline with a single pending request — the worker would
            # dispatch aged singletons forever exactly when batching
            # matters most (measured: mean_batch 1.0 at 90 clips/s).
            while True:
                try:
                    items.append(self._q.get_nowait())
                except queue.Empty:
                    break
            for item in items:
                if item is None:
                    stopping = True
                else:
                    b = _bucket(item.content.shape[0], self.bucket_step)
                    self._pending.setdefault(b, []).append(item)

            now = time.monotonic()
            for b in sorted(self._pending):
                reqs = self._pending[b]
                while reqs and (
                        len(reqs) >= self.max_batch or stopping
                        or reqs[0].t_submit + self.flush_s <= now):
                    batch, self._pending[b] = (reqs[: self.max_batch],
                                               reqs[self.max_batch :])
                    reqs = self._pending[b]
                    self._dispatch(batch)
            self._pending = {b: r for b, r in self._pending.items() if r}

            if stopping and not self._pending and self._q.empty():
                return

    def _padded_size(self, n: int) -> int:
        if self.pad_batch == "max":
            return self.max_batch
        if self.pad_batch == "pow2":
            return min(1 << (n - 1).bit_length(), self.max_batch)
        return n

    def _dispatch(self, batch: list[_Request]):
        # claim each future (RUNNING) so a late client-side cancel cannot
        # make set_result raise InvalidStateError mid-loop and poison the
        # rest of the batch; already-cancelled requests drop out here
        batch = [r for r in batch
                 if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
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
            outs = self._infer_batch(
                clips, self.refer_mel, f0s=f0s, uvs=uvs,
                **self.infer_kwargs)
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
