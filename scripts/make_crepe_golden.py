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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WEIGHT_SEED = 0
INPUT_SEED = 1


def main():
    # the torch forward lives in tests/test_utils.py::torch_crepe_oracle —
    # ONE oracle shared with the live parity test, so the committed golden
    # and the test can never drift apart
    from test_utils import make_tiny_crepe_sd, torch_crepe_oracle

    sd = make_tiny_crepe_sd(WEIGHT_SEED)
    frames = np.random.default_rng(INPUT_SEED).standard_normal(
        (4, 1024)).astype(np.float32)
    probs = torch_crepe_oracle(sd, frames)

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                       "crepe_tiny_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, probs=probs, weight_seed=WEIGHT_SEED,
             input_seed=INPUT_SEED)
    print(f"wrote {out}: probs {probs.shape}, "
          f"mean {probs.mean():.6f}, max {probs.max():.6f}")


if __name__ == "__main__":
    main()
