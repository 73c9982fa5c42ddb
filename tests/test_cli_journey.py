"""The full CLI journey as one test: preprocess.py -> train.py -> infer.py.

CI-enforces the user-facing flow the reference documents (reference
train.py:1-5, preprocess.py:73-83, infer.py:14-148 as one pipeline) so no
CLI contract can drift silently: feature extraction from raw wavs with a
real (tiny, synthesized) fairseq-layout contentvec checkpoint file, a
from-scratch training run through the train.py entry (config JSON on
disk, seed-derived run dir, final checkpoint), an overfit learning gate
parsed from the run's train.log, and batch inference through the infer.py
entry loading the orbax checkpoint + a vocos checkpoint *file* — the
exact artifact set a reference user would bring.

Everything runs on the tiny-model scale (1-layer encoders, 16-40 channel
UNet, 2-layer 128-d contentvec) so the journey finishes in minutes on the
8-virtual-device CPU mesh; the contracts exercised are full-size.
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

from ns2vc_tpu.config import (
    Config, DataConfig, DiffusionEncoderConfig, EncoderConfig, TrainConfig,
    save_config,
)


def _make_contentvec_ckpt(path: str):
    """A real fairseq-layout contentvec checkpoint file (the artifact the
    reference downloads as hubert/checkpoint_best_legacy_500.pt), tiny:
    dim 128 / 2 heads (the 64-wide-head convention load_contentvec
    assumes) / 2 layers / final_proj -> 256."""
    from tests.test_features import _hf_config, _to_fairseq_layout

    dim, heads, ffn, layers, final = 128, 2, 256, 2, 256
    torch.manual_seed(0)
    hf = transformers.HubertModel(_hf_config(dim, heads, ffn, layers))
    sd = _to_fairseq_layout(hf.state_dict(), layers,
                            (torch.randn(final, dim) * 0.02,
                             torch.zeros(final)))
    torch.save({"model": sd}, path)


def _make_vocos_ckpt(path: str):
    """A tiny public-vocos-layout checkpoint file (pytorch_model.bin
    analogue): 100 mels in, n_fft 1024 / hop 256 out."""
    torch.manual_seed(1)
    dim, inter, n_layers, n_mels, n_fft = 32, 48, 2, 100, 1024
    sd = {
        "backbone.embed.weight": torch.randn(dim, n_mels, 7) * 0.05,
        "backbone.embed.bias": torch.zeros(dim),
        "backbone.norm.weight": torch.ones(dim),
        "backbone.norm.bias": torch.zeros(dim),
        "backbone.final_layer_norm.weight": torch.ones(dim),
        "backbone.final_layer_norm.bias": torch.zeros(dim),
        "head.out.weight": torch.randn(n_fft + 2, dim) * 0.05,
        "head.out.bias": torch.zeros(n_fft + 2),
    }
    for i in range(n_layers):
        p = f"backbone.convnext.{i}"
        sd.update({
            f"{p}.dwconv.weight": torch.randn(dim, 1, 7) * 0.05,
            f"{p}.dwconv.bias": torch.zeros(dim),
            f"{p}.norm.weight": torch.ones(dim),
            f"{p}.norm.bias": torch.zeros(dim),
            f"{p}.pwconv1.weight": torch.randn(inter, dim) * 0.05,
            f"{p}.pwconv1.bias": torch.zeros(inter),
            f"{p}.pwconv2.weight": torch.randn(dim, inter) * 0.05,
            f"{p}.pwconv2.bias": torch.zeros(dim),
            f"{p}.gamma": torch.ones(dim) * 1e-2,
        })
    torch.save(sd, path)


def test_cli_journey(tmp_path, reference_dir):
    root = tmp_path

    # -- artifacts a reference user brings ------------------------------
    hubert_ckpt = str(root / "hubert_tiny.pt")
    vocos_ckpt = str(root / "vocos_tiny.bin")
    _make_contentvec_ckpt(hubert_ckpt)
    _make_vocos_ckpt(vocos_ckpt)
    dataset = str(root / "dataset")
    raw = str(root / "raw")
    for name in ["1", "2"]:
        os.makedirs(f"{dataset}/{name}", exist_ok=True)
        src = reference_dir / f"dataset/{name}/{name}.wav"
        shutil.copy(src, f"{dataset}/{name}/{name}.wav")
    os.makedirs(raw, exist_ok=True)
    shutil.copy(reference_dir / "dataset/1/1.wav", f"{raw}/1.wav")
    shutil.copy(reference_dir / "dataset/2/2.wav", f"{raw}/2.wav")

    cfg = Config(
        train=TrainConfig(
            train_batch_size=8, gradient_accumulate_every=1,
            train_lr=2e-4, train_num_steps=100,
            save_and_sample_every=10_000, keep_ckpts=2,
            max_content_frames=64, max_refer_frames=48, num_workers=0,
            log_every=1, remat=False, seed=0),
        data=DataConfig(training_files=f"{dataset}_processed",
                        val_files=f"{dataset}_processed"),
        phoneme_encoder=EncoderConfig(n_layers=1),
        prompt_encoder=EncoderConfig(in_channels=100, n_layers=1),
        diffusion_encoder=DiffusionEncoderConfig(
            block_out_channels=(16, 24, 32, 40)),
    )
    cfg_path = str(root / "config.json")
    save_config(cfg, cfg_path)

    # -- 1. preprocess.py ------------------------------------------------
    from ns2vc_tpu.data.preprocess import main as preprocess_main

    preprocess_main(["--in_dir", dataset, "--config", cfg_path,
                     "--contentvec_ckpt", hubert_ckpt,
                     "--num_workers", "1"])
    for name in ["1", "2"]:
        base = f"{dataset}_processed/{name}/{name}"
        assert os.path.exists(f"{base}.wav")
        assert os.path.exists(f"{base}.wav.f0.npy")
        assert os.path.exists(f"{base}.spec.npy")
        soft = np.load(f"{base}.wav.soft.npy")
        assert soft.shape[0] == 1 and soft.shape[1] == 256  # (1, 256, T)

    # -- 2. train.py -------------------------------------------------------
    from train import main as train_main

    # an explicit --logs_folder IS the run dir (no timestamp subdir)
    run_dir = str(root / "logs" / "run")
    train_main(["-c", cfg_path, "--logs_folder", run_dir])
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    # overfit learning gate (round-1 demo analogue): the logged loss over
    # 100 steps on a 2-utterance corpus must clearly decrease
    log_text = open(os.path.join(run_dir, "train.log")).read()
    losses = [float(m) for m in
              re.findall(r"Losses: \[([0-9.eE+-]+), 0\]", log_text)]
    assert len(losses) >= 100
    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    assert last < 0.8 * first, (first, last)

    # -- 3. infer.py -------------------------------------------------------
    from ns2vc_tpu.infer.cli import main as infer_main

    out_dir = str(root / "output")
    infer_main(["-m", os.path.join(run_dir, "ckpt"), "-c", cfg_path,
                "-n", "1.wav", "-r", "2.wav",
                "--raw_dir", raw, "--out_dir", out_dir,
                "--contentvec_ckpt", hubert_ckpt,
                "--vocos_ckpt", vocos_ckpt,
                "--sample_method", "unipc", "--sampling_timesteps", "4",
                "--compute_dtype", "float32"])
    out = os.path.join(out_dir, "1_0key_2.wav")
    assert os.path.exists(out)
    from ns2vc_tpu.utils.wavio import read_wav

    wav, sr = read_wav(out)
    assert sr == cfg.data.sampling_rate
    src_wav, src_sr = read_wav(f"{raw}/1.wav")
    src_seconds = src_wav.shape[-1] / src_sr
    assert np.isfinite(wav).all()
    # duration preserved to within slicing/padding tolerance
    assert abs(wav.shape[-1] / sr - src_seconds) < 0.3
