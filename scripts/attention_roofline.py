"""Bytes/FLOP roofline for the synth attention leaf at B=16 (VERDICT r4 #6).

Post-gelu, attention fusions are the dominant synthesis leaf
(50.9 ms = 36% of the 141.2 ms B=16 leaf, CLAUDE.md). The dot-fusion
category got a bytes-level roofline that produced the +22% gelu win;
this script gives attention the same accounting so the disposition is a
measured number, not an assertion.

Method: trace ONE denoiser step (the function the sampler scan repeats,
NaturalSpeech2.denoise with hoisted cross-KV, matching bench.py's
program) at the bench geometry under jax.eval_shape, recording every
scaled_dot_product_attention call's shapes via a monkeypatch. For each
site, account:

- HBM bytes, probs-in-VMEM model (what XLA does at B=16 — the f32
  attention-probs fusion outputs stay in VMEM through B=16 per the
  round-3 trace analysis): q,k,v reads + out write only.
- HBM bytes, probs-materialized model (the B>=24 spill regime): adds
  probs write + read at f32.
- MXU FLOPs: 2*B*H*Tq*Tk*D for each of the two einsums.

Multiply by NFE (the sampler makes `steps` x0 evaluations; bench.py runs
UniPC-50) and compare against the measured attention leaf time to place
it against the v5e HBM (~819 GB/s) and bf16-MXU (197 TFLOP/s) peaks.

Usage: python scripts/attention_roofline.py [--batch 16 --frames 400
       --steps 50 --measured_ms 50.9]
(no TPU needed — the accounting is shape-level; pass --measured_ms from
a profile_summary run of the same geometry).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--refer_frames", type=int, default=400)
    ap.add_argument("--steps", type=int, default=50,
                    help="sampler NFE (bench.py: UniPC-50)")
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="attention-fusion leaf ms/call from "
                         "profile_summary at this geometry")
    ap.add_argument("--hbm_gbps", type=float, default=819.0)
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--vpu_tops", type=float, default=3.9,
                    help="v5e VPU f32 throughput (~4096 lanes x 0.94 GHz)")
    ap.add_argument("--softmax_ops", type=float, default=6.0,
                    help="VPU ops per probs element (max-scan, sub, exp, "
                         "rowsum-scan, div, cast)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import ns2vc_tpu.ops.attention as attn_mod
    from ns2vc_tpu.config import Config
    from ns2vc_tpu.models.diffusion import NaturalSpeech2
    from ns2vc_tpu.utils.precision import cast_floating

    cfg = Config()
    model = NaturalSpeech2(cfg)
    b, t, tp = args.batch, args.frames, args.refer_frames

    sites: list[dict] = []
    orig = attn_mod.scaled_dot_product_attention

    def recorder(q, k, v, bias=None, **kw):
        sites.append({
            "q": tuple(q.shape), "k": tuple(k.shape), "v": tuple(v.shape),
            "dtype": str(q.dtype),
        })
        return orig(q, k, v, bias=bias, **kw)

    # shapes only: init abstractly, then eval_shape the per-step denoise
    rng = jax.random.PRNGKey(0)
    batch = {
        "c": jnp.zeros((b, t, 256), jnp.bfloat16),
        "refer": jnp.zeros((b, tp, 100), jnp.bfloat16),
        "spec": jnp.zeros((b, t, 100), jnp.bfloat16),
        "lengths": jnp.full((b,), t, jnp.int32),
        "refer_lengths": jnp.full((b,), tp, jnp.int32),
    }
    params = jax.eval_shape(lambda r: model.init(r, batch, r), rng)
    params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, jnp.bfloat16 if jnp.issubdtype(x.dtype, jnp.floating)
            else x.dtype),
        params)

    from ns2vc_tpu.ops.masking import sequence_mask

    def step(params, x, content, prompt, refer_mask, tstep, aug, kv):
        # both aug_emb and cross_kv hoisted, matching bench.py's program
        return model.apply(params, x, content, prompt, refer_mask, tstep,
                           cross_kv=kv, aug_emb=aug,
                           method=NaturalSpeech2.denoise)

    def enc(params, c, refer, lengths, refer_lengths):
        c_mask = sequence_mask(lengths, t)
        refer_mask = sequence_mask(refer_lengths, tp)
        content, prompt = model.apply(params, c, refer, c_mask, refer_mask,
                                      method=NaturalSpeech2.encode)
        aug, kv = model.apply(params, prompt,
                              method=NaturalSpeech2.precompute_conditioning)
        return content, prompt, refer_mask, aug, kv

    content, prompt, refer_mask, aug, kv = jax.eval_shape(
        enc, params, batch["c"], batch["refer"],
        batch["lengths"], batch["refer_lengths"])

    attn_mod.scaled_dot_product_attention = recorder
    try:
        jax.eval_shape(
            step, params,
            jax.ShapeDtypeStruct((b, t, 100), jnp.bfloat16),
            content, prompt, refer_mask,
            jax.ShapeDtypeStruct((b,), jnp.float32), aug, kv)
    finally:
        attn_mod.scaled_dot_product_attention = orig

    if not sites:
        sys.exit("no attention sites recorded — recorder did not fire")

    def nbytes(shape, dtype):
        itemsize = 2 if "bfloat16" in dtype or "float16" in dtype else 4
        return int(np.prod(shape)) * itemsize

    tot_io = tot_probs = tot_flops = 0
    print(f"{'site':>4} {'q':>22} {'k':>22} {'dtype':>9} "
          f"{'io_MB':>8} {'probs_MB':>9} {'GFLOP':>8}")
    for i, s in enumerate(sites):
        bq, hq, tq, d = s["q"]
        tk = s["k"][2]
        io = (nbytes(s["q"], s["dtype"]) + nbytes(s["k"], s["dtype"])
              + nbytes(s["v"], s["dtype"]) + nbytes(s["q"], s["dtype"]))
        probs = 2 * bq * hq * tq * tk * 4  # f32 probs write + read
        flops = 2 * 2 * bq * hq * tq * tk * d  # two einsums
        tot_io += io
        tot_probs += probs
        tot_flops += flops
        print(f"{i:>4} {str(s['q']):>22} {str(s['k']):>22} "
              f"{s['dtype']:>9} {io / 2**20:8.1f} {probs / 2**20:9.1f} "
              f"{flops / 1e9:8.2f}")

    nfe = args.steps
    io_call = tot_io * nfe
    probs_call = tot_probs * nfe
    flops_call = tot_flops * nfe
    t_io = io_call / (args.hbm_gbps * 1e9)
    t_io_spill = (io_call + probs_call) / (args.hbm_gbps * 1e9)
    t_flop = flops_call / (args.peak_tflops * 1e12)
    # softmax is pure VPU work over every probs element (the MXU can't
    # help): elements/call x ops-per-element / VPU throughput
    probs_elems_call = tot_probs // (2 * 4) * nfe
    t_vpu = probs_elems_call * args.softmax_ops / (args.vpu_tops * 1e12)
    print(f"\nper denoiser step: {len(sites)} attention sites, "
          f"{tot_io / 2**20:.1f} MB qkv+out, {tot_probs / 2**20:.1f} MB "
          f"probs(w+r), {tot_flops / 1e9:.1f} GFLOP")
    print(f"per synth call (x{nfe} NFE):")
    print(f"  HBM bound, probs-in-VMEM : {t_io * 1e3:7.2f} ms "
          f"({io_call / 2**30:.2f} GiB @ {args.hbm_gbps:.0f} GB/s)")
    print(f"  HBM bound, probs spilled : {t_io_spill * 1e3:7.2f} ms "
          f"({(io_call + probs_call) / 2**30:.2f} GiB)")
    print(f"  MXU bound (bf16 peak)    : {t_flop * 1e3:7.2f} ms "
          f"({flops_call / 1e12:.2f} TFLOP @ {args.peak_tflops:.0f} TF/s)")
    print(f"  VPU softmax bound (~)    : {t_vpu * 1e3:7.2f} ms "
          f"({probs_elems_call / 1e9:.1f}G probs elems x "
          f"{args.softmax_ops:.0f} ops @ {args.vpu_tops:.1f} Tops/s)")
    if args.measured_ms:
        m = args.measured_ms
        bounds = {"HBM(qkv+out)": t_io, "MXU": t_flop, "VPU softmax": t_vpu}
        name, tb = max(bounds.items(), key=lambda kv: kv[1])
        print(f"  measured attention leaf  : {m:7.2f} ms "
              f"=> binding bound is {name} at {tb * 1e3:.1f} ms "
              f"({tb * 1e3 / m * 100:.0f}% attained); "
              f"full-spill HBM bound would be {t_io_spill * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
