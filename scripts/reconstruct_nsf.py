"""Mel+F0 -> waveform reconstruction through NSF-HiFiGAN (the working
equivalent of the reference's live test.py tail, test.py:165-192).

Usage:
    python scripts/reconstruct_nsf.py --wav input.wav \
        --ckpt nsf_hifigan/model --config nsf_hifigan/config.json \
        --out recon.wav
"""

import argparse
import json
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", required=True)
    p.add_argument("--ckpt", required=True, help="NSF-HiFiGAN generator ckpt")
    p.add_argument("--config", required=True, help="its config.json")
    p.add_argument("--out", default="recon.wav")
    args = p.parse_args()

    import torch

    from ns2vc_tpu.audio.f0 import compute_f0_dio, interpolate_f0
    from ns2vc_tpu.audio.mel import log_mel_spectrogram
    from ns2vc_tpu.audio.resample import resample
    from ns2vc_tpu.models.nsf_hifigan import (
        NSFHiFiGANGenerator, convert_nsf_hifigan,
    )
    from ns2vc_tpu.utils.wavio import read_wav, write_wav

    cfg = json.load(open(args.config))
    sr = cfg["sampling_rate"]
    hop = int(np.prod(cfg["upsample_rates"]))

    wav, in_sr = read_wav(args.wav)
    if wav.ndim > 1:
        wav = wav.mean(axis=0)
    wav = np.asarray(resample(jnp.asarray(wav), in_sr, sr))

    mel = np.asarray(log_mel_spectrogram(
        jnp.asarray(wav), sr, cfg.get("n_fft", 2048), hop,
        cfg["num_mels"]))  # (n_mels, T)
    f0 = compute_f0_dio(wav, p_len=mel.shape[1], sampling_rate=sr,
                        hop_length=hop)
    f0, _ = interpolate_f0(f0)

    gen = NSFHiFiGANGenerator(
        num_mels=cfg["num_mels"],
        upsample_initial_channel=cfg["upsample_initial_channel"],
        upsample_rates=tuple(cfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
        resblock=str(cfg.get("resblock", "1")),
        resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in cfg["resblock_dilation_sizes"]),
        sampling_rate=sr)
    sd = torch.load(args.ckpt, map_location="cpu")["generator"]
    params = {"params": convert_nsf_hifigan(sd, cfg)}

    out = np.asarray(gen.apply(params, jnp.asarray(mel.T[None]),
                               jnp.asarray(f0[None]),
                               jax.random.PRNGKey(0)))[0]
    write_wav(args.out, out, sr)
    print(f"wrote {args.out} ({len(out) / sr:.2f}s)")


if __name__ == "__main__":
    main()
