"""Offline feature extraction entry point (reference preprocess.py).

Usage: python preprocess.py --in_dir dataset [--contentvec_ckpt ...]
"""

from ns2vc_tpu.data.preprocess import main

if __name__ == "__main__":
    main()
