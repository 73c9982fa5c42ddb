"""Batch VC inference entry point (reference infer.py).

Usage:
    python infer.py -m logs/vc/<run>/ckpt -n src.wav -r refer.wav \
        --vocos_ckpt vocos/pytorch_model.bin
"""

from ns2vc_tpu.infer.cli import main

if __name__ == "__main__":
    main()
