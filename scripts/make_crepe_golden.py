"""Regenerate tests/goldens/crepe_tiny_golden.npz.

Runs an independent torch implementation of the published CREPE
architecture (Kim et al., 2018 — the network behind the reference's
`--f0_mean_pooling` path, reference utils.py:82-94) on deterministic
PCG64 weights and input frames, and commits the sigmoid bin
probabilities as golden activations for tests/test_utils.py::TestCrepe.

torchcrepe and its pretrained weights are not installable in this image,
so these spec-derived goldens are the strongest available oracle
(VERDICT round-2 #10).

Usage: JAX_PLATFORMS=cpu python scripts/make_crepe_golden.py
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WEIGHT_SEED = 0
INPUT_SEED = 1


def main():
    from test_utils import make_tiny_crepe_sd

    from ns2vc_tpu.features.crepe import TINY_FILTERS

    sd = make_tiny_crepe_sd(WEIGHT_SEED)
    frames = np.random.default_rng(INPUT_SEED).standard_normal(
        (4, 1024)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(frames)[:, None, :, None]
        for i in range(len(TINY_FILTERS)):
            p = f"conv{i + 1}"
            x = F.pad(x, (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32))
            x = F.conv2d(x, torch.from_numpy(sd[f"{p}.weight"]),
                         torch.from_numpy(sd[f"{p}.bias"]),
                         (4, 1) if i == 0 else (1, 1))
            x = F.relu(x)
            x = F.batch_norm(
                x, torch.from_numpy(sd[f"{p}_BN.running_mean"]),
                torch.from_numpy(sd[f"{p}_BN.running_var"]),
                torch.from_numpy(sd[f"{p}_BN.weight"]),
                torch.from_numpy(sd[f"{p}_BN.bias"]),
                training=False, eps=1e-5)
            x = F.max_pool2d(x, (2, 1), (2, 1))
        x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)
        probs = torch.sigmoid(F.linear(
            x, torch.from_numpy(sd["classifier.weight"]),
            torch.from_numpy(sd["classifier.bias"]))).numpy()

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                       "crepe_tiny_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, probs=probs, weight_seed=WEIGHT_SEED,
             input_seed=INPUT_SEED)
    print(f"wrote {out}: probs {probs.shape}, "
          f"mean {probs.mean():.6f}, max {probs.max():.6f}")


if __name__ == "__main__":
    main()
