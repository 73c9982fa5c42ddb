"""Training entry point (reference train.py:1-5).

Usage:
    python train.py [-c config.json] [--resume] [--warm_start model-123.pt]
"""

import argparse


def main(argv=None):
    # must run before any jax backend use (reference multi-node analogue:
    # `accelerate launch train.py`, README.md:60-64)
    from ns2vc_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    from ns2vc_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, default=None)
    p.add_argument("--logs_folder", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest orbax checkpoint")
    p.add_argument("--warm_start", type=str, default=None,
                   help="reference model-{N}.pt to convert and load")
    args = p.parse_args(argv)

    trainer = Trainer(args.config, logs_folder=args.logs_folder)
    if args.warm_start:
        trainer.load_torch(args.warm_start)
    elif args.resume:
        trainer.load()
    trainer.train()


if __name__ == "__main__":
    main()
