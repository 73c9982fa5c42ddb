"""End-to-end training throughput at the reference production config.

Measures what the reference's `accelerate launch train.py` does per unit
time (reference model.py:748-946): full NaturalSpeech2 (101M params),
batch 32 x 272 frames, bf16 + remat, process-pool input pipeline with
double-buffered device prefetch.

Reports two rates:
- device_steps_per_sec: stepping one pre-staged batch (pure device rate)
- e2e_steps_per_sec:    Trainer.train() including host loading, collate,
  and H2D transfer through the axon tunnel

Run on the TPU chip:  python scripts/bench_training.py [--steps 60]
A synthetic preprocessed dataset (reference preprocess.py layout) is
generated under --data_dir; shapes/statistics mirror real features.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def synth_dataset(root: str, n: int = 64, seed: int = 0,
                  sr: int = 24000, hop: int = 256) -> str:
    """Write n synthetic utterances in the preprocessor's on-disk layout
    (reference preprocess.py:32-60): <u>.wav + .wav.soft.npy + .wav.f0.npy
    + .spec.npy, 430-700 mel frames each."""
    from ns2vc_tpu.utils.wavio import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        d = os.path.join(root, str(i))
        os.makedirs(d, exist_ok=True)
        frames = int(rng.integers(430, 700))
        wav = (rng.standard_normal(frames * hop) * 0.1).astype(np.float32)
        spec = rng.standard_normal((100, frames)).astype(np.float32)
        f0 = np.abs(rng.standard_normal(frames)).astype(np.float64) * 200
        f0[rng.random(frames) < 0.3] = 0.0  # unvoiced gaps
        soft = rng.standard_normal(
            (256, max(frames * 256 // 480, 10))).astype(np.float32)
        base = os.path.join(d, f"{i}.wav")
        write_wav(base, wav, sr)
        np.save(base + ".soft.npy", soft)
        np.save(base + ".f0.npy", f0)
        np.save(os.path.join(d, f"{i}.spec.npy"), spec)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--data_dir", type=str, default="/tmp/ns2vc_bench_data")
    ap.add_argument("--num_workers", type=int, default=-1,
                    help="-1 = auto (0 on <=2-CPU hosts, else 8), "
                    "matching TrainConfig.num_workers")
    ap.add_argument("--device_only", action="store_true")
    ap.add_argument("--skip_device", action="store_true")
    ap.add_argument("--loader_only", action="store_true",
                    help="measure host batch-loading throughput only")
    ap.add_argument("--no_pack", action="store_true",
                    help="loader_only: skip the in-worker transform+pack")
    ap.add_argument("--e2e_diag", action="store_true",
                    help="per-phase timing: load | H2D | step+sync")
    ap.add_argument("--log_every", type=int, default=1_000_000)
    ap.add_argument("--profile_dir", type=str, default="",
                    help="capture a jax.profiler device trace of the timed "
                    "device-rate steps (summarize with "
                    "scripts/profile_summary.py <dir>)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override train_batch_size (default: config's 32) "
                    "— probes per-chip batch scaling of the device rate "
                    "and MFU")
    ap.add_argument("--frames", type=int, default=0,
                    help="override the (content, refer) frame geometry — "
                    "measures the per-bucket device rate that "
                    "train.length_buckets dispatches to (SURVEY §7.1.6)")
    ap.add_argument("--remat", choices=["all", "dots", "off"], default=None,
                    help="rematerialization variant: all=recompute "
                    "everything (default), dots=save matmul/conv outputs, "
                    "off=no remat")
    ap.add_argument("--buckets", action="store_true",
                    help="enable length_buckets=(144,208,272) and measure "
                    "the MIXED-geometry device rate: stage real loader "
                    "batches (each at its bucket pair), chain steps across "
                    "them through the per-geometry compiled programs, "
                    "read back once — the realized bucketed throughput on "
                    "this dataset's length distribution")
    ap.add_argument("--staged", action="store_true",
                    help="like --buckets but at the fixed single geometry: "
                    "stages K DISTINCT loader batches instead of chaining "
                    "one reused batch — the apples-to-apples baseline for "
                    "the --buckets number (a reused staged batch stays "
                    "HBM-resident and can time optimistically)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NS2VC_CACHE", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    from ns2vc_tpu.config import Config
    from ns2vc_tpu.train.trainer import Trainer

    if not os.path.exists(os.path.join(args.data_dir, "0")):
        synth_dataset(args.data_dir)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, training_files=args.data_dir,
                                 val_files=args.data_dir),
        train=dataclasses.replace(
            cfg.train, num_workers=args.num_workers,
            log_every=args.log_every, save_and_sample_every=1_000_000_000),
    )
    if args.batch:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, train_batch_size=args.batch))
    if args.frames:
        assert args.frames % 8 == 0, "UNet needs T % 8 == 0"
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, max_content_frames=args.frames,
                max_refer_frames=args.frames))
    if args.remat:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, remat=args.remat != "off",
                remat_policy=args.remat if args.remat != "off" else "all"))
    if args.buckets:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, length_buckets=(144, 208, 272)))

    if args.loader_only:
        from ns2vc_tpu.data.dataset import (
            FixedShapeCollator, VCDataset, data_loader,
        )
        from ns2vc_tpu.parallel.mesh import make_batch_packer
        from ns2vc_tpu.train.trainer import dummy_batch, host_transform

        # production path, mirroring Trainer.__init__ exactly: no wav
        # decode, bf16 collate, in-worker host_transform + pack
        transform = None
        collate_dtype = np.float32
        if not args.no_pack:
            proto = host_transform(dummy_batch(cfg), cfg)
            pack, _ = make_batch_packer(proto)
            transform = lambda b: pack(host_transform(b, cfg))  # noqa: E731
            if cfg.train.compute_dtype == "bfloat16":
                import ml_dtypes

                collate_dtype = ml_dtypes.bfloat16

        n_workers = args.num_workers
        if n_workers < 0:  # trainer's auto rule
            n_workers = 0 if (os.cpu_count() or 1) <= 2 else 8
        ds = VCDataset(args.data_dir, cfg, seed=0,
                       load_audio=args.no_pack)
        dl = data_loader(ds,
                         FixedShapeCollator(cfg, include_wav=args.no_pack,
                                            float_dtype=collate_dtype),
                         cfg.train.train_batch_size, seed=0,
                         num_workers=n_workers, transform=transform)
        for _ in range(8):
            next(dl)  # warm the worker pool
        n = 60
        t0 = time.time()
        for _ in range(n):
            next(dl)
        dt = (time.time() - t0) / n
        print(json.dumps({"loader_batches_per_sec": round(1 / dt, 2),
                          "loader_ms_per_batch": round(dt * 1e3, 1),
                          "packed": transform is not None}))
        return

    t0 = time.time()
    trainer = Trainer(cfg, logs_folder="/tmp/ns2vc_bench_logs")
    print(f"init+compile(init): {time.time()-t0:.1f}s", flush=True)

    result = {}

    def to_dev(b):
        from ns2vc_tpu.parallel.mesh import batch_sharding, shard_batch

        if isinstance(b, np.ndarray):  # loader workers already packed it
            import jax as _jax

            return _jax.device_put(b, batch_sharding(trainer.mesh))
        b = trainer._host_transform(b)
        if trainer._pack is not None:
            import jax as _jax

            return _jax.device_put(trainer._pack(b),
                                   batch_sharding(trainer.mesh))
        return shard_batch(b, trainer.mesh)

    if args.buckets or args.staged:
        # mixed-geometry device rate: stage K real loader batches (each
        # already grouped+packed at its bucket pair by the workers), warm
        # every distinct geometry's program once (the compile pass is also
        # the measured-elsewhere first-round settling), then chain steps
        # across the staged batches in arrival order and read back once.
        # --staged does the same at the fixed geometry (the fair baseline).
        from ns2vc_tpu.parallel.mesh import batch_sharding

        k = max(args.steps, 24)
        with trainer.mesh:
            staged = []
            for _ in range(k):
                item = next(trainer.dl)
                geom, packed = (item if isinstance(item, tuple)
                                else (None, item))
                staged.append((geom, jax.device_put(
                    packed, batch_sharding(trainer.mesh))))
            hist: dict = {}
            for geom, _ in staged:
                hist[geom] = hist.get(geom, 0) + 1
            print(f"bucket histogram over {k} batches: {hist}", flush=True)
            state = trainer.state
            t0 = time.time()
            for geom, dev in staged:  # compile + settling pass (untimed)
                state, m = trainer._get_step_fn(geom)(state, dev,
                                                      trainer.rng)
            float(m["loss"])
            print(f"compile({len(hist)} geometries) + warm pass: "
                  f"{time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
            for geom, dev in staged:
                state, m = trainer._get_step_fn(geom)(state, dev,
                                                      trainer.rng)
            float(m["loss"])  # readback = the only trustworthy sync
            dt = (time.time() - t0) / k
        bs = cfg.train.train_batch_size
        print(json.dumps({
            "bucketed_device_steps_per_sec": round(1.0 / dt, 2),
            "bucketed_device_ms_per_step": round(dt * 1e3, 1),
            "bucketed_device_utts_per_sec": round(bs / dt, 1),
            "bucket_histogram": {str(kk): v for kk, v in hist.items()},
        }))
        return

    if not args.skip_device:
        # pure device rate: one staged batch, chained steps, readback sync
        batch = next(iter(trainer.dl))
        with trainer.mesh:
            dev = to_dev(batch)
            t0 = time.time()
            # opt-in AOT step cache hook (NS2VC_AOT_STEP=1); a no-op by
            # default — see trainer's AOT section comment for the measured
            # reasons
            trainer._ensure_step_ready(trainer.state, dev, trainer.rng)
            state, m = trainer._step_fn(trainer.state, dev, trainer.rng)
            float(m["loss"])
            print(f"compile(step): {time.time()-t0:.1f}s", flush=True)
            n = max(args.steps // 2, 10)
            if args.profile_dir:
                jax.profiler.start_trace(args.profile_dir)
            t0 = time.time()
            for _ in range(n):
                state, m = trainer._step_fn(state, dev, trainer.rng)
            float(m["loss"])  # readback = the only trustworthy sync here
            dt = (time.time() - t0) / n
            if args.profile_dir:
                jax.profiler.stop_trace()
                result["profile_dir"] = args.profile_dir
                result["profiled_steps"] = n
        result["device_steps_per_sec"] = round(1.0 / dt, 2)
        result["device_ms_per_step"] = round(dt * 1e3, 1)
        try:
            # roofline position (VERDICT round-2 #6): XLA's FLOP count of
            # the compiled train step / measured step time / chip peak
            from ns2vc_tpu.utils.roofline import compiled_flops, mfu_metrics

            compiled = (trainer._step_fn
                        if hasattr(trainer._step_fn, "cost_analysis")
                        else trainer._step_fn.lower(
                            trainer.state, dev, trainer.rng).compile())
            result.update(mfu_metrics(compiled_flops(compiled), dt,
                                      prefix="train_"))
        except Exception as e:
            result["train_mfu_error"] = str(e)[:120]
        trainer.state = state
        if args.device_only:
            print(json.dumps(result))
            return

    if args.e2e_diag:
        # phase-by-phase: host load | H2D | step+sync
        state = trainer.state
        with trainer.mesh:
            for i in range(12):
                t0 = time.perf_counter()
                hb = next(trainer.dl)
                t1 = time.perf_counter()
                dev = to_dev(hb)
                jax.block_until_ready(dev)
                t2 = time.perf_counter()
                state, m = trainer._step_fn(state, dev, trainer.rng)
                float(m["loss"])
                t3 = time.perf_counter()
                print(f"step {i}: load {1e3*(t1-t0):6.0f} ms | h2d "
                      f"{1e3*(t2-t1):6.0f} ms | step+sync "
                      f"{1e3*(t3-t2):6.0f} ms", flush=True)
        return

    # end-to-end: Trainer.train() for warmup+steps, timed via wall clock.
    # Checkpointing is disabled for the timed window (train() saves once
    # at completion — a full params+opt_state host readback that would
    # otherwise be billed to the steps).
    trainer.save = lambda *a, **k: None
    start_step = trainer.step
    trainer.train(num_steps=start_step + args.warmup)
    t0 = time.time()
    trainer.train(num_steps=start_step + args.warmup + args.steps)
    dt = (time.time() - t0) / args.steps
    result["e2e_steps_per_sec"] = round(1.0 / dt, 2)
    result["e2e_ms_per_step"] = round(dt * 1e3, 1)
    bs = cfg.train.train_batch_size
    result["e2e_utts_per_sec"] = round(bs / dt, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
