"""Serving benchmark: MicroBatcher under Poisson arrivals on one TPU chip.

Open-loop load test of the serving stack (infer/serve.py::MicroBatcher ->
Svc.infer_batch -> one jitted encode+UniPC-50+Vocos program per (batch,
length) bucket): clips arrive as a Poisson process at a swept offered
rate, and we record per-request latency (completion minus *scheduled*
arrival — queueing delay is part of the number) plus achieved throughput
and the dispatch batch-size mix. Validates the B=16 per-chip operating
point claimed in infer/serve.py:6-14 with a measured latency/throughput
curve instead of a back-of-envelope.

The reference has no serving layer at all — its Svc.infer converts one
clip per call (reference inference/infer_tool.py:189-206), so its
throughput ceiling is the single-clip RTF regardless of load.

Protocol notes (CLAUDE.md "Async-dispatch timing lies"): every dispatch
ends in Svc.infer_batch's np.asarray readback, so future resolution is a
trustworthy completion signal; each (batch, length) geometry is warmed
with two untimed rounds before any timed load (first distinct-args
executions after a compile run ~25x slow on this backend).

Usage:
    python scripts/bench_serving.py                 # default sweep
    python scripts/bench_serving.py --loads 20 60 --duration 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("NS2VC_CACHE", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _init_on_cpu(init_fn, *args):
    """Parameter init on the CPU backend (see bench.py:33-44)."""
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = jax.jit(init_fn)(*args)
        return jax.device_put(params, jax.devices()[0])
    except Exception:
        return jax.jit(init_fn)(*args)


def build_svc(steps: int):
    from ns2vc_tpu.config import Config
    from ns2vc_tpu.infer.svc import Svc
    from ns2vc_tpu.models.diffusion import NaturalSpeech2
    from ns2vc_tpu.models.vocos import Vocos

    cfg = Config()
    model = NaturalSpeech2(cfg)
    vocos = Vocos()
    rng = jax.random.PRNGKey(0)
    batch = {
        "c": jnp.zeros((1, 64, 256)), "refer": jnp.zeros((1, 64, 100)),
        "spec": jnp.zeros((1, 64, 100)),
        "lengths": jnp.full((1,), 64, jnp.int32),
        "refer_lengths": jnp.full((1,), 64, jnp.int32),
    }
    params = _init_on_cpu(lambda r: model.init(r, batch, r), rng)
    vparams = _init_on_cpu(vocos.init, rng, jnp.zeros((1, 64, 100)))
    svc = Svc(config=cfg, params=params, contentvec_ckpt="",
              vocos_params=vparams, compute_dtype="bfloat16")
    svc.vocos = vocos
    return svc


def run_load(svc, refer, clips, rate: float, duration: float,
             max_batch: int, flush_ms: float, steps: int, seed: int,
             max_inflight: int = 2, output: str = "pcm16",
             readback_threads: int = 1):
    """One offered-load point. Returns the result row.

    Batch-mix stats come from MicroBatcher.dispatch_log (appended at
    dispatch time) — wrapping infer_batch would force the serialized
    sync path and defeat the dispatch/readback pipeline under test."""
    from ns2vc_tpu.infer.serve import MicroBatcher

    rng = np.random.default_rng(seed)
    n = max(1, int(rate * duration))
    gaps = rng.exponential(1.0 / rate, size=n)
    arrivals = np.cumsum(gaps)  # seconds from t0

    lat: list[float] = []
    lat_lock = threading.Lock()

    with MicroBatcher(svc, refer, max_batch=max_batch, flush_ms=flush_ms,
                      max_inflight=max_inflight, output=output,
                      readback_threads=readback_threads,
                      sampling_timesteps=steps) as mb:
        t0 = time.perf_counter()
        futs = []
        for i in range(n):
            delay = t0 + arrivals[i] - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            sched = t0 + arrivals[i]
            fut = mb.submit(clips[i % len(clips)])

            def on_done(f, sched=sched):
                if f.exception() is None:
                    with lat_lock:
                        lat.append(time.perf_counter() - sched)

            fut.add_done_callback(on_done)
            futs.append(fut)
        for f in futs:
            f.result(timeout=600)
        wall = time.perf_counter() - t0
        dispatch_log = list(mb.dispatch_log)

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    t_frames = clips[0].shape[0]
    audio_s = n * t_frames * svc.hop_size / svc.target_sample
    disp_sizes = [d for _, d in dispatch_log]  # padded (device) batch sizes
    return {
        "offered_clips_s": rate,
        "achieved_clips_s": round(n / wall, 1),
        "requests": n,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "max_ms": round(float(lat_ms[-1]), 1),
        "mean_batch": round(float(np.mean(disp_sizes)), 2),
        "mean_batch_real": round(float(np.mean([r for r, _ in dispatch_log])),
                                 2),
        "dispatches": len(disp_sizes),
        "rtf_aggregate": round(audio_s / wall, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--loads", type=float, nargs="*",
                    default=[10.0, 30.0, 60.0, 90.0],
                    help="offered loads in clips/s")
    ap.add_argument("--duration", type=float, default=15.0,
                    help="seconds of arrivals per load point")
    ap.add_argument("--frames", type=int, default=384,
                    help="content frames per clip (384 = 4.1 s of audio, "
                         "an exact length bucket)")
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--flush_ms", type=float, default=30.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--max_inflight", type=int, default=2,
                    help="outstanding device batches (1 = the round-4 "
                         "serialized dispatch/readback behavior)")
    ap.add_argument("--readback_threads", type=int, default=1,
                    help="completion-pool size (1 = serial FIFO "
                         "readbacks; >1 overlaps D2H transfers)")
    ap.add_argument("--output", type=str, default="pcm16",
                    choices=["float32", "pcm16"],
                    help="waveform wire format; pcm16 quantizes on device "
                         "and halves D2H readback bytes")
    ap.add_argument("--wire_ab", type=int, default=0, metavar="N",
                    help="interleaved conditioning-wire A/B: N alternating "
                         "(bf16, f32) pairs of load points at the FIRST "
                         "--loads rate, all in one process so both arms "
                         "share one tunnel window (this backend's transfer "
                         "rate swings 2-4x between sessions; sequential "
                         "invocations are not comparable)")
    args = ap.parse_args(argv)

    if jax.default_backend() == "cpu" \
            and os.environ.get("NS2VC_ALLOW_CPU_BENCH") != "1":
        sys.exit("TPU backend unavailable; refusing to report a CPU "
                 "serving number (NS2VC_ALLOW_CPU_BENCH=1 overrides)")

    svc = build_svc(args.steps)
    rng = np.random.default_rng(0)
    refer = rng.standard_normal((272, 100)).astype(np.float32)
    clips = [0.1 * rng.standard_normal((args.frames, 256)).astype(np.float32)
             for _ in range(8)]

    # warm every batch geometry the pow2 batcher can dispatch: compile
    # round + one settling round each (untimed)
    sizes = []
    b = 1
    while b < args.max_batch:
        sizes.append(b)
        b <<= 1
    sizes.append(args.max_batch)
    for b in sizes:
        t0 = time.perf_counter()
        svc.infer_batch([clips[i % len(clips)] for i in range(b)], refer,
                        sampling_timesteps=args.steps, output=args.output)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        svc.infer_batch([clips[(i + 1) % len(clips)] for i in range(b)],
                        refer, sampling_timesteps=args.steps,
                        output=args.output)
        warm_s = time.perf_counter() - t0
        print(f"# warm B={b}: compile+run {compile_s:.1f}s, "
              f"warm run {warm_s * 1e3:.0f} ms", file=sys.stderr, flush=True)

    if args.wire_ab:
        # warm the other wire format's programs too (Svc._wire_dtype reads
        # NS2VC_WIRE_DTYPE per call, so one process serves both arms)
        os.environ["NS2VC_WIRE_DTYPE"] = "float32"
        for b in sizes:  # every pow2 geometry the batcher can dispatch
            svc.infer_batch([clips[i % len(clips)] for i in range(b)],
                            refer, sampling_timesteps=args.steps,
                            output=args.output)
            svc.infer_batch([clips[(i + 1) % len(clips)] for i in range(b)],
                            refer, sampling_timesteps=args.steps,
                            output=args.output)
        print("# f32-wire warmed", file=sys.stderr, flush=True)
        rate = args.loads[0]
        for pair in range(args.wire_ab):
            for wire in ("bf16", "float32"):
                if wire == "float32":
                    os.environ["NS2VC_WIRE_DTYPE"] = "float32"
                else:
                    os.environ.pop("NS2VC_WIRE_DTYPE", None)
                row = run_load(svc, refer, clips, rate, args.duration,
                               args.max_batch, args.flush_ms, args.steps,
                               seed=1 + pair,
                               max_inflight=args.max_inflight,
                               output=args.output,
                               readback_threads=args.readback_threads)
                row["wire"] = wire
                row["pair"] = pair
                print(json.dumps(row), flush=True)
        return

    for rate in args.loads:
        row = run_load(svc, refer, clips, rate, args.duration,
                       args.max_batch, args.flush_ms, args.steps, seed=1,
                       max_inflight=args.max_inflight, output=args.output,
                       readback_threads=args.readback_threads)
        row["max_inflight"] = args.max_inflight
        row["readback_threads"] = args.readback_threads
        row["output"] = args.output
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
