"""Preprocess throughput: files/min, device-bucketed path vs per-file loop.

BASELINE.md item 2 ("preprocess.py throughput over a 100-utterance set").
The reference preprocess is a per-file Python loop — one torchaudio
load/resample, one pyworld DIO call, one per-file contentvec forward on
the device (reference preprocess.py:26-83, no batching anywhere) — so its
protocol is replicated here by `process_one` (same stages, unbatched
device calls). The rebuilt path (`preprocess_dataset`) pools the host
stages across worker processes and runs contentvec in padded 4 s-bucket
batches of 8, so the device executes a handful of fixed-shape programs
instead of one compile/dispatch pair per file.

The utterance set is synthesized from the two checked-in sample wavs
(cropped to a 2-8 s length sweep) so the bench is self-contained; the
contentvec encoder is the full-size geometry (dim 768, 12 layers) with
random weights — throughput does not depend on weight values.

Usage:
    python scripts/bench_preprocess.py                # 100 files, both paths
    python scripts/bench_preprocess.py --files 40 --skip_loop
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def make_corpus(out_dir: str, n_files: int, ref_dataset: str):
    """n_files wavs, 2-8 s, cropped from the sample wavs at varied offsets."""
    from ns2vc_tpu.utils.wavio import read_wav, write_wav

    srcs = []
    for name in ["1", "2"]:
        wav, sr = read_wav(os.path.join(ref_dataset, name, f"{name}.wav"))
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        srcs.append((wav, sr))
    rng = np.random.default_rng(0)
    total_s = 0.0
    for i in range(n_files):
        wav, sr = srcs[i % len(srcs)]
        dur = float(rng.uniform(2.0, 8.0))
        n = min(int(dur * sr), len(wav))
        start = int(rng.integers(0, max(1, len(wav) - n)))
        spk = f"spk{i % 4}"
        os.makedirs(os.path.join(out_dir, spk), exist_ok=True)
        write_wav(os.path.join(out_dir, spk, f"utt{i:03d}.wav"),
                  wav[start:start + n], sr)
        total_s += n / sr
    return total_s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--skip_loop", action="store_true",
                    help="skip the per-file reference-protocol run")
    ap.add_argument("--ref_dataset", type=str,
                    default="/root/reference/dataset")
    args = ap.parse_args(argv)

    import jax

    from ns2vc_tpu.config import Config
    from ns2vc_tpu.data.preprocess import preprocess_dataset, process_one
    from ns2vc_tpu.features.contentvec import ContentVec
    from ns2vc_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    backend = jax.default_backend()
    if backend == "cpu" and os.environ.get("NS2VC_ALLOW_CPU_BENCH") != "1":
        sys.exit("TPU backend unavailable; refusing to report a CPU "
                 "preprocess number (NS2VC_ALLOW_CPU_BENCH=1 overrides)")

    cfg = Config()
    cv = ContentVec()
    # init on CPU (hundreds of small param inits; see CLAUDE.md)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cv_params = jax.jit(cv.init)(
            jax.random.PRNGKey(0), np.zeros((1, 16000), np.float32))
    cv_params = jax.device_put(cv_params, jax.devices()[0])

    root = tempfile.mkdtemp(prefix="bench_preprocess_")
    try:
        in_dir = os.path.join(root, "dataset")
        audio_s = make_corpus(in_dir, args.files, args.ref_dataset)

        # warm the device programs (compiles excluded from both timings:
        # one-time per machine via the persistent cache)
        warm_files = sorted(
            __import__("glob").glob(f"{in_dir}/**/*.wav", recursive=True))
        preprocess_dataset(in_dir, cfg, num_workers=1,
                           files=warm_files[:2],
                           contentvec=cv, contentvec_params=cv_params)
        process_one(warm_files[0], in_dir, cfg, cv, cv_params)
        shutil.rmtree(in_dir + "_processed")

        t0 = time.perf_counter()
        outs = preprocess_dataset(in_dir, cfg, num_workers=args.workers,
                                  contentvec=cv, contentvec_params=cv_params)
        batched_s = time.perf_counter() - t0
        assert len(outs) == args.files
        print(json.dumps({
            "path": "device-bucketed",
            "files": args.files, "audio_s": round(audio_s, 1),
            "wall_s": round(batched_s, 1),
            "files_per_min": round(args.files / batched_s * 60, 1),
            "workers": args.workers, "backend": backend}), flush=True)

        if not args.skip_loop:
            shutil.rmtree(in_dir + "_processed")
            t0 = time.perf_counter()
            n = 0
            for f in warm_files:
                if process_one(f, in_dir, cfg, cv, cv_params):
                    n += 1
            loop_s = time.perf_counter() - t0
            assert n == args.files
            print(json.dumps({
                "path": "per-file-loop (reference protocol)",
                "files": args.files, "audio_s": round(audio_s, 1),
                "wall_s": round(loop_s, 1),
                "files_per_min": round(args.files / loop_s * 60, 1),
                "speedup_batched": round(loop_s / batched_s, 2),
                "backend": backend}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
