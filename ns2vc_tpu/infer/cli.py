"""Batch VC inference CLI (reference infer.py:14-148 flags and flow):
format -> slice on silence -> pad 0.5 s -> Svc.infer per chunk -> unpad ->
optional linear-gradient crossfade stitch -> write
`output/{name}_{key}_{refer}.wav`."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ns2vc_tpu.infer.svc import Svc
from ns2vc_tpu.utils.wavio import write_wav


def crossfade_concat(pieces: list[np.ndarray], cross_len: int) -> np.ndarray:
    """Linear-gradient crossfade between consecutive clips
    (reference infer.py:133-139)."""
    if not pieces:
        return np.zeros(0, np.float32)
    out = pieces[0]
    for nxt in pieces[1:]:
        n = min(cross_len, len(out), len(nxt))
        if n > 0:
            ramp = np.linspace(0, 1, n, dtype=np.float32)
            merged = out[-n:] * (1 - ramp) + nxt[:n] * ramp
            out = np.concatenate([out[:-n], merged, nxt[n:]])
        else:
            out = np.concatenate([out, nxt])
    return out


def build_parser() -> argparse.ArgumentParser:
    # flag set mirrors reference infer.py:17-56
    p = argparse.ArgumentParser(description="ns2vc-tpu inference")
    p.add_argument("-m", "--model_path", type=str, required=True,
                   help="orbax ckpt dir or reference model-{N}.pt")
    p.add_argument("-c", "--config_path", type=str, default=None)
    p.add_argument("-n", "--clean_names", type=str, nargs="+", required=True)
    p.add_argument("-r", "--refer_names", type=str, nargs="+", required=True)
    p.add_argument("-t", "--trans", type=int, nargs="+", default=[0])
    p.add_argument("-s", "--slice_db", type=int, default=-40)
    p.add_argument("--clip", type=float, default=0,
                   help="force-clip long segments to this many seconds")
    p.add_argument("-lg", "--linear_gradient", type=float, default=0,
                   help="crossfade seconds between forced clips")
    p.add_argument("--pad_seconds", type=float, default=0.5)
    p.add_argument("--contentvec_ckpt", type=str,
                   default="hubert/checkpoint_best_legacy_500.pt")
    p.add_argument("--vocos_ckpt", type=str, default=None)
    p.add_argument("--sample_method", type=str, default="unipc",
                   choices=["ddpm", "ddim", "dpmsolver", "unipc"])
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--sampling_timesteps", type=int, default=30)
    p.add_argument("--solver_order", type=int, default=2, choices=[1, 2, 3],
                   help="multistep order for dpmsolver/unipc")
    p.add_argument("-wf", "--wav_format", type=str, default="wav")
    p.add_argument("--raw_dir", type=str, default="raw")
    p.add_argument("--out_dir", type=str, default="output")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    svc = Svc(args.model_path, args.config_path,
              contentvec_ckpt=args.contentvec_ckpt,
              vocos_ckpt=args.vocos_ckpt,
              compute_dtype=args.compute_dtype)
    os.makedirs(args.out_dir, exist_ok=True)

    trans = args.trans * len(args.clean_names) if len(args.trans) == 1 \
        else args.trans
    for clean_name, tran in zip(args.clean_names, trans):
        raw_path = os.path.join(args.raw_dir, clean_name)
        if not os.path.splitext(raw_path)[1]:
            raw_path += ".wav"
        for refer_name in args.refer_names:
            refer_path = os.path.join(args.raw_dir, refer_name)
            if not os.path.splitext(refer_path)[1]:
                refer_path += ".wav"
            audio = svc.slice_inference(
                raw_path, refer_path, tran=tran, slice_db=args.slice_db,
                pad_seconds=args.pad_seconds,
                sample_method=args.sample_method,
                sampling_timesteps=args.sampling_timesteps,
                clip_seconds=args.clip,
                lg_seconds=args.linear_gradient,
                order=args.solver_order)
            base = os.path.splitext(os.path.basename(clean_name))[0]
            rbase = os.path.splitext(os.path.basename(refer_name))[0]
            out = os.path.join(
                args.out_dir, f"{base}_{tran}key_{rbase}.{args.wav_format}")
            write_wav(out, audio, svc.target_sample)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
