"""Benchmark: batched end-to-end VC synthesis throughput on one TPU chip.

Measures real-time factor (seconds of 24 kHz audio generated per wall
second) of the full inference compute path — conditioning encoders + a
50-step UniPC diffusion scan + Vocos decode — at batch 8 x 400 mel frames
(~4.27 s per utterance), the reference's max training clip length
(dataset.py:98-102).

Baseline: the reference publishes no numbers (BASELINE.md); the driver's
north-star target is 200x real time per chip at 50 diffusion steps, so
vs_baseline = rtf / 200.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")  # cpu for cheap param init

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NS2VC_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _init_on_cpu(init_fn, *args):
    """Initialize parameters on the CPU backend (fast local compile) and
    transfer; the remote TPU compile path is reserved for the hot program."""
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = jax.jit(init_fn)(*args)
        return jax.device_put(params, jax.devices()[0])
    except Exception:
        # no CPU backend: still jit (un-jitted tracing dispatches hundreds
        # of tiny compiles — minutes through the remote-compile service)
        return jax.jit(init_fn)(*args)


def main(argv=None):
    import argparse

    from ns2vc_tpu.config import Config
    from ns2vc_tpu.diffusion.samplers import unipc_sample
    from ns2vc_tpu.diffusion.schedule import NoiseSchedule
    from ns2vc_tpu.models.diffusion import NaturalSpeech2
    from ns2vc_tpu.models.vocos import Vocos
    from ns2vc_tpu.ops.masking import sequence_mask

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sweep", type=int, nargs="*", default=None,
                    help="measure these batch sizes (one JSON row each) "
                         "instead of the default single-line bench")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="capture a jax.profiler trace of the timed calls")
    ap.add_argument("--skip_single_clip", action="store_true")
    args_cli = ap.parse_args(argv)

    # The driver records this script's output as the round's headline
    # number. If the axon TPU plugin fails to initialize (flaky tunnel —
    # observed UNAVAILABLE outages), JAX_PLATFORMS="axon,cpu" silently
    # falls back to the CPU backend and the bench would report a
    # meaningless CPU RTF. Self-restart a few times, then refuse.
    if (jax.default_backend() == "cpu"
            and os.environ.get("NS2VC_ALLOW_CPU_BENCH") != "1"):
        import sys

        tries = int(os.environ.get("NS2VC_BENCH_RETRY", "0"))
        if tries < 4:
            print(f"TPU backend unavailable; retry {tries + 1}/4 in 120 s",
                  file=sys.stderr, flush=True)
            time.sleep(120)
            os.environ["NS2VC_BENCH_RETRY"] = str(tries + 1)
            # re-exec with the args THIS invocation received: when main()
            # is called programmatically with an explicit argv, sys.argv
            # belongs to the host process and would silently restart the
            # bench at the default configuration
            cli = list(argv) if argv is not None else sys.argv[1:]
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)] + cli,
                      os.environ)
        sys.exit("TPU backend unavailable after retries; refusing to "
                 "report a CPU number (NS2VC_ALLOW_CPU_BENCH=1 overrides)")

    B, T, TP, STEPS = args_cli.batch, 400, 272, 50
    SR, HOP = 24000, 256

    cfg = Config()
    model = NaturalSpeech2(cfg)
    vocos = Vocos()
    rng = jax.random.PRNGKey(0)

    def make_batch(b):
        return {
            "c": jax.random.normal(rng, (b, T, 256)) * 0.1,
            "refer": jax.random.normal(rng, (b, TP, 100)),
            "spec": jnp.zeros((b, T, 100)),
            "lengths": jnp.full((b,), T, jnp.int32),
            "refer_lengths": jnp.full((b,), TP, jnp.int32),
        }

    batch = make_batch(B)
    params = _init_on_cpu(lambda r: model.init(r, batch, r), rng)
    vparams = _init_on_cpu(vocos.init, rng, jnp.zeros((1, T, 100)))
    schedule = NoiseSchedule(cfg.train.timesteps)

    from ns2vc_tpu.utils.precision import cast_floating

    @jax.jit
    def synthesize(params, vparams, c, refer, lengths, refer_lengths, noise,
                   prev_audio):
        # bf16 activations + params (f32 norm reductions / softmax inside)
        params = cast_floating(params, jnp.bfloat16)
        vparams = cast_floating(vparams, jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
        refer = refer.astype(jnp.bfloat16)
        b, t = noise.shape[:2]
        # data dependency on the previous call's output (see measure());
        # 1e-6-scaled so the workload itself is unchanged
        noise = noise + 1e-6 * prev_audio[:, :t * 100].reshape(b, t, 100)
        noise = noise.astype(jnp.bfloat16)
        c_mask = sequence_mask(lengths, c.shape[1])
        refer_mask = sequence_mask(refer_lengths, refer.shape[1])
        content, prompt = model.apply(params, c, refer, c_mask, refer_mask,
                                      method=NaturalSpeech2.encode)
        # step-invariant conditioning hoisted out of the 50-step scan
        aug, kvs = model.apply(params, prompt,
                               method=NaturalSpeech2.precompute_conditioning)

        def x0_fn(x, t):
            return model.apply(params, x, content, prompt, refer_mask, t,
                               cross_kv=kvs, aug_emb=aug,
                               method=NaturalSpeech2.denoise)

        mel = unipc_sample(x0_fn, noise, schedule, steps=STEPS)
        return vocos.apply(vparams, mel).astype(jnp.float32)

    from ns2vc_tpu.utils.roofline import compiled_flops, mfu_metrics

    def program_flops(b):
        """XLA's own FLOP count of the compiled synthesize program (the
        lowering is served from the jit/persistent cache — no extra
        remote compile after measure() ran at this batch)."""
        try:
            mb = make_batch(b)
            return compiled_flops(synthesize.lower(
                params, vparams, mb["c"], mb["refer"], mb["lengths"],
                mb["refer_lengths"], jnp.zeros((b, T, 100)),
                jnp.zeros((b, T * HOP))).compile())
        except Exception:
            return None

    def measure(b, iters=5):
        """wall seconds per synthesize() call at batch b.

        Each timed call folds the previous call's audio back into its noise
        input (x1e-6) and the chain ends in a host readback: repeated
        *identical* dispatches can be deduped by the runtime, and
        block_until_ready alone has been observed returning before device
        completion on this backend — a readback is the only trustworthy
        sync. Reported number = chain wall time / iters."""
        mb = make_batch(b)
        noise = jax.random.normal(rng, (b, T, 100))

        def call(prev_audio):
            return synthesize(params, vparams, mb["c"], mb["refer"],
                              mb["lengths"], mb["refer_lengths"], noise,
                              prev_audio)

        audio = call(jnp.zeros((b, T * HOP)))  # warmup / compile
        np.asarray(audio[:1, :1])
        # one full untimed chained round: the first distinct-args
        # executions after compile run ~25x slower through this runtime
        # (measured 2.8 s/call settling to 106 ms/call on round 2)
        for _ in range(iters):
            audio = call(audio)
        np.asarray(audio[:1, :1])
        profiling = args_cli.profile_dir is not None
        if profiling:
            jax.profiler.start_trace(os.path.join(args_cli.profile_dir,
                                                  f"b{b}"))
        start = time.perf_counter()
        for _ in range(iters):
            audio = call(audio)
        np.asarray(audio[:1, :1])
        elapsed = (time.perf_counter() - start) / iters
        if profiling:
            jax.profiler.stop_trace()
        return elapsed

    if args_cli.sweep:
        for b in args_cli.sweep:
            elapsed = measure(b)
            rtf = b * T * HOP / SR / elapsed
            row = {"batch": b, "ms": round(elapsed * 1e3, 1),
                   "rtf": round(rtf, 1),
                   "ms_per_utt": round(elapsed * 1e3 / b, 2)}
            row.update(mfu_metrics(program_flops(b), elapsed))
            print(json.dumps(row), flush=True)
        return

    elapsed = measure(B)
    audio_seconds = B * T * HOP / SR
    rtf = audio_seconds / elapsed

    result = {
        "metric": "vc_synthesis_rtf_50step",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 200.0, 3),
    }
    # roofline position: achieved TFLOP/s and fraction of chip peak
    result.update(mfu_metrics(program_flops(B), elapsed))
    if not args_cli.skip_single_clip:
        # single-clip latency (B=1, T=400): the interactive-use number —
        # same compiled program shape as Svc's jitted per-bucket path
        single_ms = measure(1) * 1000.0
        result["single_clip_ms"] = round(single_ms, 1)
        result["single_clip_rtf"] = round((T * HOP / SR)
                                          / (single_ms / 1000.0), 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
