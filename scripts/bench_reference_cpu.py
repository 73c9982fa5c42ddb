"""Reference (PyTorch) sampling RTF on this host's CPU — BASELINE.md item 1.

The reference publishes no performance numbers (BASELINE.md): its infer
path prints wall time per call (reference inference/infer_tool.py:200-205)
but no value is recorded anywhere. This script measures it ourselves by
timing the reference's own `NaturalSpeech2.sample` (reference
model.py:606-697: pre_model.infer conditioning + the UniPC loop at its
hard-coded 30 NFE / order 2 / bh2) on the torch-CPU build available in
this image, at the same geometry bench.py uses (T=400 content frames =
4.27 s of 24 kHz audio, full-size 6-layer-encoder config, ~101M params).

Random weights — wall time does not depend on weight values. The vocos
decode is stubbed to zeros (vocos is not installed; the reference calls
`vocos.decode(mel)` at model.py:692), so the number is mel-generation
only — strictly FAVORABLE to the reference when compared against
bench.py, which includes the Vocos decode.

--mine additionally times this repo's sampler on the SAME host CPU
(f32, same shapes, same 30 NFE) for a hardware-matched framework
comparison: one compiled lax.scan program vs the reference's
Python-driven loop.

Usage:
    python scripts/bench_reference_cpu.py            # reference only
    python scripts/bench_reference_cpu.py --mine     # + this framework
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def bench_reference(T: int, TP: int, steps: int, iters: int) -> dict:
    import torch

    from ref_oracle import load_reference

    torch.set_num_threads(os.cpu_count() or 1)
    model_mod, _ = load_reference()

    cfg = {
        "train": {"timesteps": 1000, "sampling_timesteps": 1000},
        "phoneme_encoder": {"in_channels": 256, "hidden_channels": 256,
                            "out_channels": 256, "n_layers": 6,
                            "p_dropout": 0.2},
        "prompt_encoder": {"in_channels": 100, "hidden_channels": 256,
                           "out_channels": 256, "n_layers": 6,
                           "p_dropout": 0.2},
        "f0_predictor": {},
        "diffusion_encoder": {"in_channels": 100, "out_channels": 100,
                              "hidden_channels": 256, "n_heads": 8,
                              "p_dropout": 0.2},
    }
    torch.manual_seed(0)
    ref = model_mod.NaturalSpeech2(cfg).eval()

    class _VocosStub:
        """model.py:691-692 does `vocos.to(device); vocos.decode(mel)`."""

        def to(self, device):
            return self

        def decode(self, mel):
            return torch.zeros(mel.shape[0], 1, mel.shape[-1] * 256)

    c = torch.randn(1, 256, T)
    refer = torch.randn(1, 100, TP)
    lengths = torch.tensor([T])
    refer_lengths = torch.tensor([TP])

    times = []
    with torch.no_grad():
        for i in range(iters + 1):  # first call untimed (allocator warmup)
            start = time.perf_counter()
            audio, mel = ref.sample(c, refer, 0, 0, lengths, refer_lengths,
                                    _VocosStub(), sampling_timesteps=steps,
                                    sample_method="unipc")
            elapsed = time.perf_counter() - start
            if i:
                times.append(elapsed)
    sec = sum(times) / len(times)
    return {"impl": "reference_torch_cpu", "nfe": 30, "sec_per_clip":
            round(sec, 2), "rtf": round(T * 256 / 24000 / sec, 4),
            "note": "mel only (vocos stubbed) — favorable to the reference"}


def bench_mine(T: int, TP: int, steps: int, iters: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ns2vc_tpu.config import Config
    from ns2vc_tpu.diffusion.samplers import unipc_sample
    from ns2vc_tpu.diffusion.schedule import NoiseSchedule
    from ns2vc_tpu.models.diffusion import NaturalSpeech2
    from ns2vc_tpu.ops.masking import sequence_mask

    cfg = Config()
    model = NaturalSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "c": jnp.zeros((1, T, 256)), "refer": jnp.zeros((1, TP, 100)),
        "spec": jnp.zeros((1, T, 100)),
        "lengths": jnp.full((1,), T, jnp.int32),
        "refer_lengths": jnp.full((1,), TP, jnp.int32),
    }
    params = jax.jit(lambda r: model.init(r, batch, r))(rng)
    schedule = NoiseSchedule(cfg.train.timesteps)

    @jax.jit
    def synthesize(params, c, refer, noise):
        c_mask = sequence_mask(jnp.full((1,), T, jnp.int32), T)
        refer_mask = sequence_mask(jnp.full((1,), TP, jnp.int32), TP)
        content, prompt = model.apply(params, c, refer, c_mask, refer_mask,
                                      method=NaturalSpeech2.encode)
        aug, kvs = model.apply(params, prompt,
                               method=NaturalSpeech2.precompute_conditioning)

        def x0_fn(x, t):
            return model.apply(params, x, content, prompt, refer_mask, t,
                               cross_kv=kvs, aug_emb=aug,
                               method=NaturalSpeech2.denoise)

        # order 2 to match the reference sample() call exactly
        return unipc_sample(x0_fn, noise, schedule, steps=steps, order=2)

    noise = jax.random.normal(rng, (1, T, 100))
    mel = synthesize(params, batch["c"], batch["refer"], noise)  # compile
    np.asarray(mel)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        mel = synthesize(params, batch["c"], batch["refer"],
                         noise + 1e-6 * mel.mean())
        np.asarray(mel)
        times.append(time.perf_counter() - start)
    sec = sum(times) / len(times)
    return {"impl": "ns2vc_tpu_jax_cpu", "nfe": steps, "sec_per_clip":
            round(sec, 2), "rtf": round(T * 256 / 24000 / sec, 4),
            "note": "mel only (no vocoder), f32, same host"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--refer_frames", type=int, default=272)
    ap.add_argument("--steps", type=int, default=30,
                    help="NFE for --mine (the reference hard-codes 30)")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--mine", action="store_true")
    args = ap.parse_args(argv)

    print(json.dumps(bench_reference(args.frames, args.refer_frames,
                                     args.steps, args.iters)), flush=True)
    if args.mine:
        print(json.dumps(bench_mine(args.frames, args.refer_frames,
                                    args.steps, args.iters)), flush=True)


if __name__ == "__main__":
    main()
