"""Convert a reference model-{N}.pt checkpoint into this framework's orbax
layout offline (alternative to `train.py --warm_start` / `infer.py -m x.pt`).

Usage: python scripts/convert_checkpoint.py --pt model-679.pt --out ckpt_dir \
           [-c config.json]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("-c", "--config", default=None)
    args = p.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from ns2vc_tpu.utils.convert_reference import load_reference_checkpoint

    params, step = load_reference_checkpoint(args.pt)
    mgr = ocp.CheckpointManager(
        os.path.abspath(args.out),
        options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": jax.tree.map(np.asarray, {"params": params})}))
    mgr.wait_until_finished()
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {args.pt} (step {step}, {n/1e6:.1f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
