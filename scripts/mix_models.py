"""Weight-space model mixing (reference mix_model, utils.py:499-510):
average or ratio-blend several checkpoints into one.

Usage: python scripts/mix_models.py --pts a.pt b.pt [--ratios 0.5 0.5] \
           --out mixed_ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pts", nargs="+", required=True,
                   help="reference .pt checkpoints to mix")
    p.add_argument("--ratios", nargs="+", type=float, default=None)
    p.add_argument("--out", required=True, help="output orbax dir")
    args = p.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from ns2vc_tpu.utils.checkpoints import mix_models
    from ns2vc_tpu.utils.convert_reference import load_reference_checkpoint

    trees, step = [], 0
    for path in args.pts:
        params, s = load_reference_checkpoint(path)
        trees.append(params)
        step = max(step, s)
    ratios = args.ratios or [1.0 / len(trees)] * len(trees)
    assert len(ratios) == len(trees)
    mixed = mix_models(trees, ratios)
    mgr = ocp.CheckpointManager(
        os.path.abspath(args.out),
        options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": jax.tree.map(np.asarray, {"params": mixed})}))
    mgr.wait_until_finished()
    print(f"mixed {len(trees)} checkpoints (ratios {ratios}) -> {args.out}")


if __name__ == "__main__":
    main()
