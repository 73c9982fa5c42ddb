"""Training/eval datasets and fixed-shape batching.

Mirrors the reference data pipeline (dataset.py:15-180) with one TPU-first
change: the collator pads every batch to a *fixed* geometry
(max_content_frames / max_refer_frames from TrainConfig) instead of
per-batch max+1 — XLA compiles the train step exactly once.

Feature files: our preprocessor writes `.soft.npy` / `.f0.npy` /
`.spec.npy`; datasets preprocessed by the reference (`.soft.pt` /
`.spec.pt`, preprocess.py:37-60) load transparently when torch is
available.

The zero-shot training trick is preserved exactly (dataset.py:94-115
random_slice): crop to <=400 mel frames, cut a random contiguous 1/3-2/3
span as the *reference prompt*, splice the remainder as content/target.

In-memory item layout is time-major (T, C) — flipped once at load from
the on-disk (C, T) reference layout — so the whole hot path (frame-rate
expansion, random_slice crops/splices, collate cast-assign) runs on
contiguous rows; the batch dict keeps the package-wide (B, T, C).
"""

from __future__ import annotations

import glob
import os
import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from ns2vc_tpu.audio.f0 import interpolate_f0
from ns2vc_tpu.config import Config
from ns2vc_tpu.utils.wavio import read_wav


# Per-path npy header cache: np.load re-parses the header on every call
# (magic + ast.literal_eval of the descr dict — ~0.4 ms/file, ~40 ms per
# batch of 32 items x 3 feature files on this host). Training data is
# immutable for the life of a run, so after the first full np.load we
# remember (offset, dtype, shape) and later reads are one seek+fromfile.
_NPY_HEADERS: dict = {}


def _fast_npy_load(path: str) -> np.ndarray:
    info = _NPY_HEADERS.get(path)
    if info is None:
        data = np.load(path)
        try:
            with open(path, "rb") as f:
                version = np.lib.format.read_magic(f)
                header = getattr(
                    np.lib.format,
                    f"read_array_header_{version[0]}_{version[1]}")(f)
                shape, fortran, dtype = header
                if not fortran and dtype.hasobject is False:
                    _NPY_HEADERS[path] = (f.tell(), dtype, shape)
        except Exception:
            pass  # unusual layout: keep using np.load for this path
        return data
    offset, dtype, shape = info
    with open(path, "rb") as f:
        f.seek(offset)
        data = np.fromfile(f, dtype=dtype,
                           count=int(np.prod(shape, dtype=np.int64)))
    return data.reshape(shape)


def _npy_shape(path: str) -> Optional[tuple]:
    """Header-only shape of a .npy file (no data read). Returns None when
    the file is missing or not a plain npy (e.g. the reference's .pt
    artifacts)."""
    info = _NPY_HEADERS.get(path)
    if info is not None:
        return info[2]
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = getattr(
                np.lib.format,
                f"read_array_header_{version[0]}_{version[1]}")(f)
        return shape
    except Exception:
        return None


def _load_feature(path_no_ext: str, suffix: str) -> np.ndarray:
    """Load `<path>.<suffix>.npy` or the reference's `.pt` equivalent."""
    npy = path_no_ext + suffix + ".npy"
    if os.path.exists(npy):
        return _fast_npy_load(npy)
    pt = path_no_ext + suffix + ".pt"
    if os.path.exists(pt):
        import torch

        return torch.load(pt, map_location="cpu").numpy()
    raise FileNotFoundError(f"{npy} (or .pt)")


def repeat_expand_2d(content: np.ndarray, target_len: int) -> np.ndarray:
    """Nearest-neighbor frame-rate expansion (reference utils.py:482-496,
    same index mapping in time-major layout): content (T_src, C) ->
    (target_len, C). The reference walks a cursor (idx[i] = max j such
    that pos[j] <= i); searchsorted computes the same index without the
    per-frame Python loop, and the row gather on a contiguous (T, C)
    array is a block memcpy per output frame (the reference's (C, T)
    column gather strides C times per frame — measured 3-4x slower on
    this loader's hot path)."""
    src_len = content.shape[0]
    pos = np.arange(src_len) * target_len / src_len
    idx = np.searchsorted(pos, np.arange(target_len), side="right") - 1
    np.maximum(idx, 0, out=idx)
    return content[idx]


class VCDataset:
    """Training dataset (reference NS2VCDataset, dataset.py:53-125)."""

    def __init__(self, audio_path: str, cfg: Config, all_in_mem: bool = False,
                 seed: Optional[int] = None, load_audio: bool = True):
        self.audiopaths = sorted(
            glob.glob(os.path.join(audio_path, "**/*.wav"), recursive=True))
        self.sampling_rate = cfg.data.sampling_rate
        self.hop_length = cfg.data.hop_length
        self.rng = random.Random(seed)
        self.rng.shuffle(self.audiopaths)
        self.all_in_mem = all_in_mem
        # load_audio=False skips the wav decode entirely: the train step
        # never reads the waveform (the trainer drops it on the H2D path;
        # ~1.2 ms/item decode + an 8.9 MB/batch collate field on this
        # host). Eval keeps audio for the gen/gt/refer triplet logging.
        self.load_audio = load_audio
        if all_in_mem:
            self.cache = [self.get_audio(p) for p in self.audiopaths]

    def __len__(self):
        return len(self.audiopaths)

    def get_audio(self, filename: str):
        """Load aligned (c, f0, spec, audio, uv) for one utterance
        (reference dataset.py:73-92)."""
        if self.load_audio:
            audio, sr = read_wav(filename)
            if audio.ndim > 1:
                audio = audio.mean(axis=0)
            if sr != self.sampling_rate:
                # NumPy path (identical polyphase kernel): keeps worker
                # processes device-free — safe under fork
                from ns2vc_tpu.audio.resample import resample_np

                audio = resample_np(audio, sr, self.sampling_rate)
        else:
            audio = np.zeros(0, np.float32)
        base = filename  # features live next to the wav, suffixed
        # On-disk features keep the reference's (C, T) layout
        # (preprocess.py writes it, real reference artifacts ship it);
        # everything downstream of this method is time-major (T, C) —
        # random_slice becomes contiguous row views and the collator a
        # straight cast-assign, which is where the loader's time goes.
        spec = _load_feature(base.replace(".wav", ""), ".spec")
        if spec.ndim == 3:
            spec = spec[0]
        spec = np.ascontiguousarray(spec.T)
        f0_raw = _fast_npy_load(filename + ".f0.npy")
        f0, uv = interpolate_f0(f0_raw)
        c = _load_feature(base, ".soft")
        if c.ndim == 3:
            c = c[0]
        c = repeat_expand_2d(np.ascontiguousarray(c.T), f0.shape[0])

        lmin = min(c.shape[0], spec.shape[0])
        assert abs(c.shape[0] - spec.shape[0]) < 3, (
            c.shape, spec.shape, filename)
        if self.load_audio:
            assert abs(audio.shape[-1] - lmin * self.hop_length) \
                < 3 * self.hop_length
        spec, c, f0, uv = spec[:lmin], c[:lmin], f0[:lmin], uv[:lmin]
        audio = audio[: lmin * self.hop_length]
        return c, f0, spec, audio, uv

    @staticmethod
    def slice_plan(n_frames: int, rng: random.Random):
        """The crop/split decisions of random_slice as a pure function of
        the item's frame count and an rng (reference dataset.py:94-115):
        returns None for too-short items, else (start, u, v, total) —
        crop [start, start+total), prompt span [u, v) within the crop.
        Shared by random_slice and the cross-host-synchronized schedule
        (synced_data_loader), which must predict every item's post-slice
        (content, refer) geometry from on-disk lengths alone."""
        if n_frames < 30:
            return None
        start = 0
        if n_frames > 400:
            start = rng.randint(0, n_frames - 400)
            n_frames = 400
        l = rng.randint(n_frames // 3, n_frames // 3 * 2)
        u = rng.randint(0, n_frames - l)
        return start, u, u + l, n_frames

    def random_slice(self, c, f0, spec, audio, uv, rng=None):
        """Prompt/content split (reference dataset.py:94-115). 2-D fields
        are time-major (T, C): crops are contiguous row views and the
        cut-out concatenations block memcpys (vs the reference's strided
        (C, T) column slicing). `rng` overrides the dataset rng (the
        synced multi-host loader passes a per-item seeded one so every
        host can predict the slice geometry without loading data)."""
        plan = self.slice_plan(spec.shape[0], rng or self.rng)
        if plan is None:
            return None
        start, u, v, total = plan
        if start or total != spec.shape[0]:
            end = start + total
            spec, c, f0, uv = (spec[start:end], c[start:end],
                               f0[start:end], uv[start:end])
            audio = audio[start * self.hop_length : end * self.hop_length]
        refer = spec[u:v]
        c = np.concatenate([c[:u], c[v:]], axis=0)
        f0 = np.concatenate([f0[:u], f0[v:]], axis=-1)
        spec = np.concatenate([spec[:u], spec[v:]], axis=0)
        uv = np.concatenate([uv[:u], uv[v:]], axis=-1)
        audio = np.concatenate([audio[: u * self.hop_length],
                                audio[v * self.hop_length :]], axis=-1)
        assert c.shape[0] != 0 and refer.shape[0] != 0
        return refer, c, f0, spec, audio, uv

    def __getitem__(self, index: int):
        item = (self.cache[index] if self.all_in_mem
                else self.get_audio(self.audiopaths[index]))
        return self.random_slice(*item)

    def item_frames(self, index: int) -> int:
        """Aligned frame count of item `index` from feature HEADERS only
        (no data read): get_audio truncates every field to
        lmin = min(len(f0), spec frames), so the schedule can know each
        item's length — and therefore, via slice_plan, its post-slice
        bucket geometry — without touching the bulk data. Falls back to a
        full load for non-npy (.pt) artifacts."""
        if not hasattr(self, "_frames_cache"):
            self._frames_cache: dict[int, int] = {}
        n = self._frames_cache.get(index)
        if n is not None:
            return n
        path = self.audiopaths[index]
        f0_shape = _npy_shape(path + ".f0.npy")
        spec_shape = _npy_shape(path.replace(".wav", "") + ".spec.npy")
        if f0_shape is not None and spec_shape is not None:
            n = min(int(f0_shape[-1]), int(spec_shape[-1]))
        else:  # .pt artifacts: load once, cache the answer
            c, f0, spec, audio, uv = self.get_audio(path)
            n = spec.shape[0]
        self._frames_cache[index] = n
        return n

    def get_sliced(self, index: int, rng: random.Random):
        """Load item `index` and slice it with an explicit rng (the synced
        loader re-seeds per (seed, schedule position) so the realized
        geometry matches the one the schedule predicted on every host)."""
        item = (self.cache[index] if self.all_in_mem
                else self.get_audio(self.audiopaths[index]))
        return self.random_slice(*item, rng=rng)


class EvalDataset(VCDataset):
    """Pairs item i with item (i+4) mod N as the reference speaker
    (reference TestDataset, dataset.py:15-50)."""

    def __getitem__(self, index: int):
        a = (self.cache[index] if self.all_in_mem
             else self.get_audio(self.audiopaths[index]))
        b_idx = (index + 4) % len(self)
        b = (self.cache[b_idx] if self.all_in_mem
             else self.get_audio(self.audiopaths[b_idx]))
        return (*a, *b)


class FixedShapeCollator:
    """Zero-pad a list of random_slice outputs to a fixed batch geometry
    (replaces the reference's dynamic max+1 padding, dataset.py:128-180).
    Returns a dict of numpy arrays in (B, T, C) layout.

    `include_wav=False` omits the waveform field (the train step never
    reads it — trainer host_transform drops it before H2D); `float_dtype`
    collates float features directly in the compute dtype (bf16 halves
    the collate+queue bytes; host_transform's cast becomes a no-op)."""

    def __init__(self, cfg: Config, include_wav: bool = True,
                 float_dtype=np.float32):
        self.t_c = cfg.train.max_content_frames
        self.t_r = cfg.train.max_refer_frames
        self.hop = cfg.data.hop_length
        self.include_wav = include_wav
        self.float_dtype = float_dtype

    def __call__(self, batch: list,
                 geometry: tuple[int, int] | None = None) -> dict:
        batch = [b for b in batch if b is not None]
        assert batch, "empty batch after filtering short clips"
        t_c, t_r = geometry if geometry is not None else (self.t_c, self.t_r)
        n = len(batch)
        c_dim = batch[0][1].shape[1]
        spec_dim = batch[0][3].shape[1]
        fd = self.float_dtype
        out = {
            "c": np.zeros((n, t_c, c_dim), fd),
            "refer": np.zeros((n, t_r, spec_dim), fd),
            "f0": np.zeros((n, t_c), fd),
            "spec": np.zeros((n, t_c, spec_dim), fd),
            "uv": np.zeros((n, t_c), fd),
            "lengths": np.zeros((n,), np.int32),
            "refer_lengths": np.zeros((n,), np.int32),
        }
        if self.include_wav:
            out["wav"] = np.zeros((n, t_c * self.hop), fd)
        # items are time-major (T, C) — every 2-D field assignment below
        # is a contiguous cast-assign (the former (C, T) layout needed a
        # per-field transpose; its fused strided-transpose + cast ran a
        # scalar inner loop in numpy, ~3.3x slower, and was the largest
        # single collate cost).
        for i, (refer, c, f0, spec, audio, uv) in enumerate(batch):
            lc = min(c.shape[0], t_c)
            lr = min(refer.shape[0], t_r)
            out["lengths"][i] = lc
            out["refer_lengths"][i] = lr
            out["c"][i, :lc] = c[:lc]
            out["refer"][i, :lr] = refer[:lr]
            out["f0"][i, :lc] = f0[:lc]
            out["spec"][i, :lc] = spec[:lc]
            out["uv"][i, :lc] = uv[:lc]
            if self.include_wav:
                lw = min(audio.shape[-1], t_c * self.hop)
                out["wav"][i, :lw] = audio[:lw]
        return out


class BucketedCollator(FixedShapeCollator):
    """Length-bucketed fixed-shape batching (SURVEY §7.1.6): pads each
    batch to the smallest (content, refer) bucket pair that fits its
    items instead of always (max_content_frames, max_refer_frames).

    The reference pads per-batch to max+1 (dataset.py:148-153) — dynamic
    shapes XLA would recompile on every batch. A short ascending bucket
    list (multiples of 8, the UNet T constraint) keeps the compiled-shape
    count bounded while recovering most of the padding waste: device step
    time scales ~linearly with T, and random_slice makes content and
    refer lengths anti-correlated (they sum to the clip length), so the
    always-max geometry wastes compute on nearly every batch.

    `data_loader` groups items by `bucket_of` so every emitted batch is
    uniform in its pair. Note the pair-grouping trade-off: batches become
    length-correlated (the reference's random batches are too, through
    its per-batch max padding). The masked loss is invariant to the
    content pad length; the pooled prompt embedding follows the
    reference's unmasked padded-mean quirk (model.py:344), so it varies
    with the refer pad length exactly like the reference's per-batch
    padding does."""

    def __init__(self, cfg, buckets, refer_buckets=(),
                 include_wav: bool = True, float_dtype=np.float32):
        super().__init__(cfg, include_wav=include_wav,
                         float_dtype=float_dtype)

        def _norm(bk, name):
            out = tuple(sorted(dict.fromkeys(int(b) for b in bk)))
            assert all(b % 8 == 0 and b > 0 for b in out), \
                f"{name} must be positive multiples of 8 (UNet T % 8): {out}"
            return out

        self.buckets = _norm(buckets, "buckets")
        assert self.buckets, "BucketedCollator needs at least one bucket"
        # refer buckets default to the single fixed t_r: the refer axis
        # only feeds the prompt encoder + cross-KV, so bucketing it
        # multiplies the compiled-program count (and the measured
        # program-switching cost) for little step-time gain
        self.refer_buckets = _norm(refer_buckets, "refer_buckets") \
            or (self.t_r,)

    @staticmethod
    def _fit(buckets, length: int, cap: int) -> int:
        """Smallest bucket >= length, clamped to the axis cap (items
        beyond the cap are cropped, matching FixedShapeCollator)."""
        length = min(length, cap)
        for b in buckets:
            if b >= length:
                return min(b, cap)
        return min(buckets[-1], cap)

    def bucket_of_lengths(self, content_len: int,
                          refer_len: int) -> tuple[int, int]:
        """(content, refer) geometry from post-slice lengths alone — the
        synced multi-host schedule computes these from slice_plan without
        loading the item."""
        return (self._fit(self.buckets, content_len, self.t_c),
                self._fit(self.refer_buckets, refer_len, self.t_r))

    def bucket_of(self, item) -> tuple[int, int]:
        """(content, refer) geometry for one random_slice output."""
        refer, c = item[0], item[1]
        return self.bucket_of_lengths(c.shape[0], refer.shape[0])

    def geometries(self) -> list[tuple[int, int]]:
        """Every (t_c, t_r) pair this collator can emit (for pre-building
        per-geometry packers / warming per-shape compiled steps)."""
        cs = sorted({min(b, self.t_c) for b in self.buckets})
        rs = sorted({min(b, self.t_r) for b in self.refer_buckets})
        return [(tc, tr) for tc in cs for tr in rs]

    def __call__(self, batch: list,
                 geometry: tuple[int, int] | None = None) -> dict:
        items = [b for b in batch if b is not None]
        assert items, "empty batch after filtering short clips"
        if geometry is None:
            pairs = [self.bucket_of(b) for b in items]
            geometry = (max(p[0] for p in pairs), max(p[1] for p in pairs))
        return super().__call__(items, geometry=geometry)


class _Batcher:
    """Accumulates loaded items into full batches. With a bucketed
    collator, items are grouped by their (content, refer) bucket pair so
    every emitted batch has one uniform geometry; otherwise a single
    FIFO buffer."""

    def __init__(self, collator, batch_size: int):
        self.collator = collator
        self.n = batch_size
        self.bucketed = hasattr(collator, "bucket_of")
        self.bufs: dict = {}

    def add(self, item) -> Optional[dict]:
        """Returns a collated batch once one fills, else None."""
        key = self.collator.bucket_of(item) if self.bucketed else None
        buf = self.bufs.setdefault(key, [])
        buf.append(item)
        if len(buf) < self.n:
            return None
        self.bufs[key] = buf[self.n:]
        if self.bucketed:
            return self.collator(buf[: self.n], geometry=key)
        return self.collator(buf[: self.n])


def _item_seed(seed: int, epoch: int, pos: int) -> int:
    """Per-scheduled-item rng seed, identical on every host: a function of
    the run seed and the item's (epoch, position) in the SHARED shuffled
    order only — never of host-local state."""
    return (seed * 0x9E3779B1 + epoch * 0x85EBCA77 + pos * 0xC2B2AE35) \
        & 0x7FFFFFFF


def synced_schedule(dataset: "VCDataset", collator, global_batch: int,
                    seed: int = 0) -> Iterator[tuple]:
    """Cross-host-DETERMINISTIC batch schedule (the multi-host answer to
    VERDICT r3 #1; reference analogue: Accelerate's synchronized sharded
    DataLoader, model.py:779). Yields an infinite stream of
    (geometry, [(index, item_seed), ...]) global batches where
    `geometry` is the (content, refer) bucket pair and the entry list has
    `global_batch` items of that geometry.

    Every host derives the SAME stream because it depends only on:
    the shared seed (epoch shuffle + per-item slice rng), the on-disk
    feature lengths (item_frames — header reads, no bulk data), and the
    collator's bucket edges. slice_plan(frames, Random(item_seed))
    predicts each item's post-slice (content, refer) lengths; the actual
    load later replays the identical plan via get_sliced. Hosts therefore
    agree on the geometry sequence — so bucketed multi-host training
    dispatches the SAME compiled step program at every step and the
    gradient all-reduce cannot deadlock — and on which items form each
    batch, so host shards stay disjoint."""
    rng = random.Random(seed)
    bucketed = hasattr(collator, "bucket_of_lengths")
    bufs: dict = {}
    epoch = -1
    order: list[int] = []
    pos = 0
    while True:
        if not order:
            epoch += 1
            pos = 0
            order = list(range(len(dataset)))
            rng.shuffle(order)
        idx = order.pop()
        iseed = _item_seed(seed, epoch, pos)
        pos += 1
        plan = VCDataset.slice_plan(dataset.item_frames(idx),
                                    random.Random(iseed))
        if plan is None:
            continue
        _, u, v, total = plan
        geom = (collator.bucket_of_lengths(total - (v - u), v - u)
                if bucketed else None)
        buf = bufs.setdefault(geom, [])
        buf.append((idx, iseed))
        if len(buf) == global_batch:
            bufs[geom] = []
            yield geom, buf


def _load_scheduled_batch(dataset, collator, entries, geometry,
                          transform=None):
    """Load + collate one host's slice of a scheduled batch, checking the
    realized slice geometry against the schedule's prediction (a drift
    here would silently diverge the compiled-program sequence across
    hosts — fail loudly instead)."""
    items = []
    for idx, iseed in entries:
        item = dataset.get_sliced(idx, random.Random(iseed))
        assert item is not None, \
            f"schedule predicted a valid slice for item {idx} " \
            f"but the load produced none (stale feature files?)"
        items.append(item)
    if geometry is not None:
        realized = [collator.bucket_of(it) for it in items]
        assert all(r == geometry for r in realized), (
            f"slice-geometry drift: schedule said {geometry}, "
            f"load realized {sorted(set(realized))}")
    batch = collator(items, geometry=geometry)
    return transform(batch) if transform else batch


def _synced_worker(dataset, collator, work_q, out_q, transform=None):
    """Process-pool worker for synced_data_loader: pulls
    (seq, geometry, entries) work units, pushes (seq, batch)."""
    try:
        while True:
            seq, geom, entries = work_q.get()
            out_q.put((seq, _load_scheduled_batch(
                dataset, collator, entries, geom, transform)))
    except Exception:
        import traceback

        out_q.put(("__error__", traceback.format_exc()))


def synced_data_loader(dataset: VCDataset, collator, batch_size: int,
                       seed: int = 0, num_workers: int = 0,
                       shard_index: int | None = None,
                       shard_count: int | None = None,
                       transform=None) -> Iterator:
    """Multi-host batch iterator over the synced_schedule: all hosts walk
    the identical (geometry, entries) stream; host `shard_index` loads
    only entries[i*B:(i+1)*B] of each global batch (`batch_size` is
    PER-HOST, matching data_loader / the reference's per-process DDP
    batch; the global batch is batch_size * shard_count items of one
    geometry). Yields what `transform` yields (e.g. the trainer's
    (geometry, packed) tuples), preserving schedule order — with workers,
    results are re-sequenced so every host emits batch k at step k."""
    if shard_index is None or shard_count is None:
        try:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        except Exception:
            shard_index, shard_count = 0, 1
    schedule = synced_schedule(dataset, collator, batch_size * shard_count,
                               seed=seed)

    def my_slice(entries):
        return entries[shard_index * batch_size:
                       (shard_index + 1) * batch_size]

    if num_workers <= 0:
        for geom, entries in schedule:
            yield _load_scheduled_batch(dataset, collator, my_slice(entries),
                                        geom, transform)
        return

    import multiprocessing

    ctx = multiprocessing.get_context("fork")
    work_q = ctx.Queue(maxsize=num_workers * 4)
    out_q = ctx.Queue(maxsize=num_workers * 4)
    for _ in range(num_workers):
        ctx.Process(target=_synced_worker,
                    args=(dataset, collator, work_q, out_q, transform),
                    daemon=True).start()

    def feeder():
        for seq, (geom, entries) in enumerate(schedule):
            work_q.put((seq, geom, my_slice(entries)))

    threading.Thread(target=feeder, daemon=True).start()
    pending: dict = {}
    next_seq = 0
    while True:
        while next_seq not in pending:
            seq, payload = out_q.get()
            if seq == "__error__":
                raise RuntimeError(f"synced data worker failed:\n{payload}")
            pending[seq] = payload
        yield pending.pop(next_seq)
        next_seq += 1


def _process_worker(dataset, collator, batch_size, idx_q, out_q, wseed,
                    transform=None):
    """Process-pool worker: pulls index chunks, loads + collates whole
    batches with no GIL contention, pushes finished batch dicts. An
    optional `transform` (e.g. the trainer's host_transform + pack) runs
    HERE, so the queue carries the small packed payload instead of the
    full collated dict (the pickle/pipe cost of ~27 MB/batch was the
    round-2 loader bottleneck, VERDICT #2)."""
    dataset.rng = random.Random(wseed)  # de-correlate random_slice crops
    batcher = _Batcher(collator, batch_size)
    try:
        while True:
            for i in idx_q.get():
                item = dataset[i]
                if item is None:
                    continue
                batch = batcher.add(item)
                if batch is not None:
                    out_q.put(transform(batch) if transform else batch)
    except Exception:
        import traceback

        out_q.put(("__error__", traceback.format_exc()))


def data_loader(dataset: VCDataset, collator: FixedShapeCollator,
                batch_size: int, seed: int = 0, num_workers: int = 0,
                drop_last: bool = True,
                shard_index: int | None = None,
                shard_count: int | None = None,
                use_processes: bool | None = None,
                transform=None) -> Iterator[dict]:
    """Infinite shuffled batch iterator with optional background prefetch
    workers (the reference uses a 32-worker torch DataLoader, model.py:777).

    Workers default to fork-based *processes* (threads hit the GIL on the
    numpy-heavy load path: measured 3.9 steps/s host-fed vs a 9.28 steps/s
    device rate with threads); pass use_processes=False for threads where
    fork is unavailable.

    `transform` (a picklable/fork-inherited callable on the collated
    batch dict) runs inside the workers; use it to shrink the
    inter-process payload (drop logging-only fields, bf16-cast, pack)
    before it crosses the queue — the trainer's packed-H2D path feeds
    `host_transform + pack` here so the main process receives a single
    ready-to-ship (B, N) uint8 buffer.

    On multi-host meshes pass shard_index/shard_count (defaults to
    jax.process_index()/process_count()) so each host reads a disjoint
    slice of the epoch — the TPU-native replacement for Accelerate's
    sharded DataLoader (reference model.py:779)."""
    if shard_index is None or shard_count is None:
        try:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        except Exception:
            shard_index, shard_count = 0, 1
    rng = random.Random(seed)
    order: list[int] = []

    def next_index():
        nonlocal order
        if not order:
            epoch = list(range(len(dataset)))
            rng.shuffle(epoch)
            order = epoch[shard_index::shard_count] or epoch[:1]
        return order.pop()

    serial_batcher = _Batcher(collator, batch_size)

    def make_batch():
        while True:
            item = dataset[next_index()]
            if item is None:
                continue
            batch = serial_batcher.add(item)
            if batch is not None:
                return transform(batch) if transform else batch

    if num_workers <= 0:
        while True:
            yield make_batch()

    if use_processes is None:
        import multiprocessing

        use_processes = "fork" in multiprocessing.get_all_start_methods()

    if use_processes:
        import multiprocessing

        ctx = multiprocessing.get_context("fork")
        idx_q = ctx.Queue(maxsize=num_workers * 4)
        out_q = ctx.Queue(maxsize=max(2, num_workers * 2))
        for w in range(num_workers):
            ctx.Process(
                target=_process_worker,
                args=(dataset, collator, batch_size, idx_q, out_q,
                      seed * 7919 + 1000 + w, transform),
                daemon=True).start()

        def feeder():  # index handout is trivial — one feeder thread
            while True:
                idx_q.put([next_index() for _ in range(batch_size)])

        threading.Thread(target=feeder, daemon=True).start()
        while True:
            batch = out_q.get()
            if isinstance(batch, tuple) and batch[0] == "__error__":
                raise RuntimeError(f"data worker failed:\n{batch[1]}")
            yield batch
        return

    q: queue.Queue = queue.Queue(maxsize=max(2, num_workers * 2))
    lock = threading.Lock()

    def worker():
        batcher = _Batcher(collator, batch_size)
        try:
            while True:
                with lock:  # lock covers index handout ONLY;
                    idx = next_index()  # loading runs in parallel
                item = dataset[idx]
                if item is None:
                    continue
                batch = batcher.add(item)
                if batch is not None:
                    q.put(transform(batch) if transform else batch)
        except Exception:  # propagate through the queue
            import traceback

            q.put(("__error__", traceback.format_exc()))

    for _ in range(num_workers):
        threading.Thread(target=worker, daemon=True).start()
    while True:
        batch = q.get()
        if isinstance(batch, tuple) and batch[0] == "__error__":
            raise RuntimeError(f"data worker failed:\n{batch[1]}")
        yield batch
