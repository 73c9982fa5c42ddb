"""End-to-end learning re-validation at the current head (VERDICT r4 #3).

Re-runs the round-1 overfit recipe with the SHIPPED trainer defaults —
full reference model config, bf16 + remat='dots', bucketed collator,
EMA on, dtype-dispatched GEGLU — so compound regressions that tiny-model
parity tests cannot see (e.g. a bf16 path interaction) show up as a
quality number:

1. preprocess the two reference sample utterances
   (/root/reference/dataset/{1,2}) with the in-repo pipeline, reusing
   the checked-in contentvec features (.soft.pt) like the round-1 demo;
2. train 1500 steps (batch 32 over 2 items = heavy overfit) on the real
   chip;
3. fixed-seed UniPC-30 eval sample through the trainer's own eval path
   (EMA params when enabled, trainer.py:711-713);
4. report generated-vs-ground-truth mel L1, the mean-mel baseline L1,
   and Pearson correlation.

Round-1 recorded: mel L1 0.614 (mean-baseline 1.14, corr 0.90). The
gate is L1 <= 0.614 at the same recipe, on the raw params (round 1
predates EMA). Round-5 measured result (v5e, 2026-08-19): raw-params
mel L1 0.3771 / corr 0.959 — PASS, materially better than round 1;
EMA-eval L1 0.809 (expected: 47% residual init weight at this horizon);
run fully deterministic (two runs, identical per-step losses).

Usage: python scripts/overfit_demo.py [--steps 1500] [--out /tmp/overfit]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def prepare_data(root: str, reference: str) -> str:
    import torch

    from ns2vc_tpu.config import Config
    from ns2vc_tpu.data.preprocess import preprocess_dataset

    in_dir = os.path.join(root, "raw")
    for name in ["1", "2"]:
        os.makedirs(f"{in_dir}/{name}", exist_ok=True)
        shutil.copy(f"{reference}/dataset/{name}/{name}.wav",
                    f"{in_dir}/{name}/{name}.wav")
    preprocess_dataset(in_dir, Config(), contentvec_ckpt=None, num_workers=1)
    for name in ["1", "2"]:
        c = torch.load(f"{reference}/dataset/{name}/{name}.wav.soft.pt",
                       map_location="cpu").numpy()
        np.save(f"{in_dir}_processed/{name}/{name}.wav.soft.npy", c)
    return f"{in_dir}_processed"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", type=str, default="/tmp/overfit_demo")
    ap.add_argument("--reference", type=str, default="/root/reference")
    ap.add_argument("--eval_seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NS2VC_CACHE", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if jax.default_backend() == "cpu" \
            and os.environ.get("NS2VC_ALLOW_CPU_BENCH") != "1":
        sys.exit("TPU backend unavailable; this is a TPU re-validation "
                 "(NS2VC_ALLOW_CPU_BENCH=1 overrides)")

    os.makedirs(args.out, exist_ok=True)
    processed = prepare_data(args.out, args.reference)

    from ns2vc_tpu.config import Config, DataConfig, TrainConfig
    from ns2vc_tpu.train.trainer import Trainer

    # shipped defaults: full model, bf16, remat='dots', EMA on, content
    # buckets; only loader workers + logging cadence are trimmed for the
    # 1-core dev host
    cfg = Config(
        train=TrainConfig(
            train_batch_size=32, use_ema=True,
            length_buckets=(144, 208, 272),
            save_and_sample_every=10 ** 9, log_every=250,
            num_workers=0, seed=0),
        data=DataConfig(training_files=processed, val_files=processed),
    )
    tr = Trainer(cfg, logs_folder=os.path.join(args.out, "logs"))

    t0 = time.perf_counter()
    tr.train(num_steps=args.steps)
    train_s = time.perf_counter() - t0
    tr.save()  # keep the artifact: eval variants can rerun without retraining
    print(f"# trained {args.steps} steps in {train_s:.0f}s "
          f"({args.steps / train_s:.2f} steps/s end-to-end)",
          file=sys.stderr, flush=True)

    def eval_metrics():
        out = tr.sample_eval(jax.random.PRNGKey(args.eval_seed))
        assert out is not None
        mel, _wav, gt, _refer, _gt_audio, _refer_audio = out
        mel = np.asarray(mel, np.float64)
        gt = np.asarray(gt, np.float64)
        # normalize layouts to (100, T)
        if mel.shape[0] != 100:
            mel = mel.T
        if gt.shape[0] != 100:
            gt = gt.T
        t_len = min(mel.shape[1], gt.shape[1])
        mel, gt = mel[:, :t_len], gt[:, :t_len]
        l1 = float(np.mean(np.abs(mel - gt)))
        mean_baseline = float(np.mean(np.abs(gt.mean() - gt)))
        corr = float(np.corrcoef(mel.ravel(), gt.ravel())[0, 1])
        return l1, mean_baseline, corr

    # EMA eval (the trainer's own milestone-eval weights) — informational
    # at this horizon: after only steps/ema_update_every updates at decay
    # 0.995, the EMA still carries 0.995^(steps/10) of the RANDOM INIT
    # (47% at 1500 steps), so it lags the raw params by construction; in
    # a production-length run the EMA dominates. The round-1 gate (0.614)
    # predates EMA and applies to the raw-params eval.
    l1_ema, _, corr_ema = eval_metrics()
    tr.state = tr.state.replace(ema_params=None)  # raw-params eval
    l1, mean_baseline, corr = eval_metrics()
    row = {
        "steps": args.steps,
        "mel_l1": round(l1, 4),
        "mean_baseline_l1": round(mean_baseline, 4),
        "corr": round(corr, 4),
        "mel_l1_ema": round(l1_ema, 4),
        "corr_ema": round(corr_ema, 4),
        "ema_init_weight": round(0.995 ** (args.steps / 10), 3),
        "train_steps_per_s_e2e": round(args.steps / train_s, 2),
        "round1_gate": 0.614,
        "pass": l1 <= 0.614,
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
